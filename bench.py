"""Benchmark harness (driver contract: prints ONE JSON line).

Metric (BASELINE.md): utterances·iterations/sec/chip for discrete-HMM
forward-backward EM on a Flickr8k-scale corpus, vs the per-utterance float64
NumPy oracle on one CPU core (the reference's compute pattern).  Target from
BASELINE.json north star: >= 50x.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

N_UTTERANCES = 8000  # Flickr8k-scale (8k images)
# 100 iterations in ONE fused scan dispatch (BASELINE.md protocol): the axon
# relay adds ~50 ms fixed latency per dispatch+host-read; at 10 iters that
# fixed cost ate ~60% of the measurement (round-1 driver number 1.03M vs the
# amortized 2.8M utt*iter/s).  100 iters amortizes it to <10%.
N_ITERS_TPU = 100
ORACLE_UTTS = 128  # oracle measured on a subset, per-utterance cost is flat
ORACLE_ITERS = 1


def main() -> None:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm
    from multimodalworddiscovery_tpu.oracles.numpy_hmm import NumpyHMM

    gen = dict(n_concepts=60, n_phones=48, min_concepts=3, max_concepts=6, seed=0)
    corpus, _, _ = make_flickr8k_mini(n_utterances=N_UTTERANCES, **gen)

    # --- CPU oracle baseline (reference-style per-utterance loop) ---
    # Same generator, small host-side corpus: avoids pulling the full device
    # corpus back over the (rate-limited) TPU tunnel just to feed the oracle.
    small, _, _ = make_flickr8k_mini(n_utterances=ORACLE_UTTS, **gen)
    src = np.asarray(small.src)
    trg = np.asarray(small.trg)
    sl = np.asarray(small.src_len)
    tl = np.asarray(small.trg_len)
    src_seqs = [src[i, : sl[i]] for i in range(ORACLE_UTTS)]
    trg_seqs = [trg[i, : tl[i]] for i in range(ORACLE_UTTS)]
    oracle = NumpyHMM(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)
    t0 = time.perf_counter()
    for _ in range(ORACLE_ITERS):
        oracle.em_iteration()
    oracle_time = time.perf_counter() - t0
    oracle_throughput = ORACLE_UTTS * ORACLE_ITERS / oracle_time

    # --- TPU batched EM: one fused lax.scan dispatch (BASELINE.md protocol).
    # Timing forces a HOST READ of the final log-likelihood: through the axon
    # relay, block_until_ready on stepwise loops has been observed to return
    # on enqueue-ack, and the relay's speculator can replay previously seen
    # request sequences — a scalar transfer of a fresh value can't be faked.
    # use_pallas mirrors the production auto-select (cli._resolve_use_pallas):
    # at N=8000 the wide-block fused E-step beats the XLA scan even at S=12
    train = jax.jit(lambda p: hmm.train(p, corpus, N_ITERS_TPU, use_pallas=True))
    params = hmm.init(corpus)
    p1, lls_warm = train(params)  # warm-up / compile; also the EM trajectory
    jax.block_until_ready(p1)
    t0 = time.perf_counter()
    # the timed call's INPUT is the warm-up's output: a different request
    # sequence with fresh values, so the relay cannot ack from history
    p, lls = train(p1)
    final_ll = float(lls[-1])  # host transfer inside the timed region
    tpu_time = time.perf_counter() - t0
    tpu_throughput = N_UTTERANCES * N_ITERS_TPU / tpu_time
    # sanity: the warm-up run (from init) must improve near-monotonically
    # (fp32 EM can dip ~1e-4 relative near convergence; exact monotonicity is
    # an x64 property); the timed run (already converged) must stay finite
    lw = np.asarray(lls_warm)
    assert np.all(np.diff(lw) > -1e-3 * np.abs(lw[:-1])), lw
    assert lw[-1] > lw[0], lw
    assert np.isfinite(final_ll), np.asarray(lls)

    print(
        json.dumps(
            {
                "metric": "hmm_fwdbwd_em_utterances_per_sec_per_chip",
                "value": round(tpu_throughput, 1),
                "unit": "utt*iter/s",
                "vs_baseline": round(tpu_throughput / oracle_throughput, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
