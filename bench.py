"""Benchmark harness (driver contract: the LAST stdout line is ONE JSON line).

Metric (BASELINE.md): utterances·iterations/sec/chip for discrete-HMM
forward-backward EM on a Flickr8k-scale corpus, vs the per-utterance float64
NumPy oracle on one CPU core (the reference's compute pattern).  Target from
BASELINE.json north star: >= 50x.

Also prints (as plain text, before the JSON line) the COMPUTE-DENSE shape:
S=128 continuous-regime EM with achieved FLOP/s and %-of-v5e-peak — the
headline shape (S=12) is latency-bound and says nothing about kernel quality
(full MFU tables: scripts/bench_kernels.py -> bench/results.jsonl and
docs/PERFORMANCE.md).
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
# Oracle denominator: MEDIAN of 5 runs of 4 iterations over 512 utterances.
# Round-4 verdict: the old 256x2 best-of-3 window let vs_baseline swing ~30%
# between driver sessions (57k -> 40k x) purely on host load while the TPU
# numerator was stable — a ~16 s window with a median is load-robust where a
# ~4 s best-of was not.  oracle_utt_iter_per_sec is emitted in the JSON so
# driver artifacts expose which side of the ratio moved.
ORACLE_UTTS = 512
ORACLE_ITERS = 4
ORACLE_REPS = 5


def _dense_shape_report() -> str:
    """One fused-EM measurement at the compute-dense S=128 shape with
    explicit MFU accounting (v5e peaks: 197 TFLOP/s bf16 MXU — fp32-HIGHEST
    dots are ~6 bf16 passes -> 33 TFLOP/s ceiling; 819 GB/s HBM).  FLOP
    model: 3 recursion matmuls/step = 6*S^2*N*Ts per EM iteration."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=512, n_concepts=400, n_phones=48, min_concepts=48,
        max_concepts=64, min_word_len=2, max_word_len=3, seed=2,
    )
    s, ts, n = 2 * corpus.max_trg_len, corpus.max_src_len, corpus.n
    iters = 50
    train = jax.jit(lambda p: hmm.train(p, corpus, iters, use_pallas=True))
    p1, _ = train(hmm.init(corpus))
    jax.block_until_ready(p1)
    dt = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        p1, lls = train(p1)  # timed input = previous timed OUTPUT: every
        # rep is a byte-distinct request, so the relay cannot replay an
        # ack-without-compute response into the min() (CLAUDE.md protocol)
        _ = float(lls[-1])  # fresh host scalar inside the timed region
        dt = min(dt, (time.perf_counter() - t0) / iters)
    flops = 6.0 * s * s * n * ts
    hbm = 4.0 * ts * s * n * 4
    return (
        f"compute-dense fused EM S={s} Ts={ts} N={n}: "
        f"{dt * 1e3:.2f} ms/iter, {flops / dt / 1e12:.2f} TFLOP/s = "
        f"{100 * flops / dt / (197e12 / 6):.1f}pct of v5e fp32-HIGHEST MXU "
        f"peak ({100 * flops / dt / 197e12:.1f}pct of bf16 peak, "
        f"{100 * hbm / dt / 819e9:.1f}pct of HBM bandwidth)"
    )


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
    oracle_times = []
    for _ in range(ORACLE_REPS):  # median-of-5 (round-4 verdict weak #1)
        oracle = NumpyHMM(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)
        t0 = time.perf_counter()
        for _ in range(ORACLE_ITERS):
            oracle.em_iteration()
        oracle_times.append(time.perf_counter() - t0)
    oracle_time = float(np.median(oracle_times))
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
    # best-of-3 (CLAUDE.md): a single sample can eat a multi-hundred-ms
    # relay hiccup — observed 853k vs 4.9M utt*iter/s on back-to-back runs.
    # Each rep's INPUT is the previous rep's OUTPUT: a different request
    # sequence with fresh values, so the relay cannot ack from history.
    tpu_time = 1e9
    final_ll = np.nan
    for _ in range(3):
        t0 = time.perf_counter()
        p1, lls = train(p1)
        final_ll = float(lls[-1])  # host transfer inside the timed region
        tpu_time = min(tpu_time, time.perf_counter() - t0)
    tpu_throughput = N_UTTERANCES * N_ITERS_TPU / tpu_time
    # sanity: the warm-up run (from init) must improve near-monotonically
    # (fp32 EM can dip ~1e-4 relative near convergence; exact monotonicity is
    # an x64 property); the timed run (already converged) must stay finite
    lw = np.asarray(lls_warm)
    assert np.all(np.diff(lw) > -1e-3 * np.abs(lw[:-1])), lw
    assert lw[-1] > lw[0], lw
    assert np.isfinite(final_ll), np.asarray(lls)

    print(_dense_shape_report())
    print(
        json.dumps(
            {
                "metric": "hmm_fwdbwd_em_utterances_per_sec_per_chip",
                "value": round(tpu_throughput, 1),
                "unit": "utt*iter/s",
                "vs_baseline": round(tpu_throughput / oracle_throughput, 1),
                # auditability (round-4 verdict): which side of the ratio
                # moved between driver sessions, and how noisy the host was
                "oracle_utt_iter_per_sec": round(oracle_throughput, 2),
                "oracle_rep_spread": round(
                    (max(oracle_times) - min(oracle_times)) / oracle_time, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
