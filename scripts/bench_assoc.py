"""Measure the associative/blocked matrix-product forward pass as a
single-chip MFU lever — round-3 VERDICT item 3.

The claim to test: the sequential forward recursion (O(T S^2) work, T
sequential steps) is latency-bound on TPU, and composing [S, S] step
matrices with MXU-dense log-semiring matmuls (O(T S^3) work,
O(T/block + log block) depth — ``hmm_core.forward_blocked``) could buy wall
time from the idle MXU.  Roofline arithmetic says no at S=128 (S-fold FLOP
increase vs ~12x headroom to the fp32-HIGHEST ceiling); this script replaces
that assertion with measurements, appended to bench/results.jsonl.

Shapes: the S64/S128 dense-region regimes of bench_kernels.bench_hmm_estep,
at reduced N so the [Ts, N, S, S] prefix tensors fit HBM (throughput is
reported per utterance, so rows stay comparable).

Timing per CLAUDE.md: reps chained in ONE lax.scan with the emissions
perturbed by the previous logz (the relay cannot ack-without-compute or
replay), host read of the final scalar, best-of-3.

Usage: python scripts/bench_assoc.py [--out bench/results.jsonl] [--cpu]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench/results.jsonl")
    ap.add_argument("--cpu", action="store_true", help="local CPU (smoke)")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm, hmm_core

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    def record(**rec):
        rec["ts"] = time.time()
        rec["device"] = str(jax.devices()[0])
        with out.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec))

    shapes = [
        ("S64", dict(n_utterances=256, n_concepts=200, n_phones=48,
                     min_concepts=24, max_concepts=32, min_word_len=3,
                     max_word_len=5, seed=1)),
        ("S128", dict(n_utterances=64, n_concepts=400, n_phones=48,
                      min_concepts=48, max_concepts=64, min_word_len=2,
                      max_word_len=3, seed=2)),
    ]
    if args.cpu:
        shapes = [("S8", dict(n_utterances=16, n_concepts=20, n_phones=16,
                              seed=0))]

    reps = args.reps
    for label, gen in shapes:
        corpus, _, _ = make_flickr8k_mini(**gen)
        params = hmm.init(corpus)
        log_init, log_trans, log_emit = hmm._machinery(params, corpus)
        n, ts, s_states = log_emit.shape

        variants = [("fwd_scan", hmm_core.forward),
                    ("fwd_assoc", hmm_core.forward_associative)]
        for b in (8, 16, 32):
            variants.append(
                (f"fwd_blocked_b{b}",
                 functools.partial(hmm_core.forward_blocked, block=b))
            )

        base_dt = None
        for name, fn in variants:
            def chained(emit0, fn=fn):
                def body(emit, _):
                    _, logz = fn(log_init, log_trans, emit, corpus.src_len)
                    z = jnp.sum(logz)
                    # output feeds the next rep's input: replay-proof
                    return emit + 1e-12 * z, z
                return jax.lax.scan(body, emit0, None, length=reps)

            run = jax.jit(chained)
            try:
                e1, zs = run(log_emit)
                jax.block_until_ready(e1)
            except Exception as exc:  # noqa: BLE001  (OOM at this shape)
                record(kernel=name, shape=label, N=n, Ts=ts, S=s_states,
                       error=type(exc).__name__)
                continue
            best = float("inf")
            for _ in range(3):
                t = time.perf_counter()
                e2, zs = run(e1)
                _ = float(zs[-1])
                best = min(best, (time.perf_counter() - t) / reps)
            # FLOP model: scan = 2 S^2 N per step (one log-semiring
            # vector-matrix product); matrix forms = the within-block tree's
            # ~(Ts-1) [S,S]x[S,S] products, 2 S^3 N each (recovery/boundary
            # terms are lower order)
            flops = (2.0 * s_states**2 * n * ts if name == "fwd_scan"
                     else 2.0 * s_states**3 * n * ts)
            rec = dict(kernel=name, shape=label, N=n, Ts=ts, S=s_states,
                       ms=round(best * 1e3, 3),
                       utt_per_sec=round(n / best),
                       flops_per_sec=round(flops / best),
                       logz_check=round(float(zs[-1]), 3))
            if name == "fwd_scan":
                base_dt = best
            elif base_dt is not None:
                rec["x_vs_scan"] = round(best / base_dt, 2)
            record(**rec)


if __name__ == "__main__":
    main()
