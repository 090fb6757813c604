"""Out-of-core streaming EM benchmark: disk -> host -> device overlap.

Measures, on the real chip, the cost of streaming the corpus from mmap
shards every iteration (data/stream.py) against the fully device-resident
per-iteration em_step loop on the SAME corpus — the overlap efficiency of
the double-buffered reader.  Resident timing uses per-iteration dispatches
(not the fused 100-iter scan) so both sides pay the same dispatch latency
and the delta isolates I/O.

Replay-proofing (CLAUDE.md): params evolve every iteration, so every
request body is distinct; the per-iteration loglik host read is a fresh
scalar inside the timed region.  Best-of-3 everywhere.

Appends rows to bench/results.jsonl.
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import jax
import numpy as np


def _record(out_path: Path, **rec):
    rec["ts"] = time.time()
    rec["device"] = str(jax.devices()[0])
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench/results.jsonl")
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--shard-size", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--cpu", action="store_true",
        help="local CPU backend: measures the reader/overlap design without "
             "the remote relay's ~75 ms fixed cost per execute-with-fresh-"
             "buffers (which dominates the TPU rows in this environment and "
             "would not exist on locally-attached hardware)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    out = Path(args.out)

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        train_streaming,
        write_shards,
    )
    from multimodalworddiscovery_tpu.models import hmm

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=args.n, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )
    with tempfile.TemporaryDirectory() as td:
        n_shards = write_shards(corpus, td, args.shard_size)
        reader = ShardedCorpusReader(td)
        params0 = hmm.init(corpus)
        use_pallas = jax.devices()[0].platform != "cpu"
        ckw = dict(use_pallas=use_pallas)

        # --- resident per-iteration loop (same dispatch granularity) ---
        step = jax.jit(lambda p, c: hmm.em_step(p, c, **ckw))
        p, st = step(params0, corpus)  # warmup/compile
        jax.block_until_ready(p)
        best_res = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                p, st = step(p, corpus)
                _ = float(st["loglik"])  # fresh scalar each iteration
            best_res = min(best_res, time.perf_counter() - t0)
        res_throughput = args.n * args.iters / best_res
        _record(out, kernel="stream_resident_em", n=args.n,
                iters=args.iters, ms_per_iter=round(best_res / args.iters * 1e3, 3),
                utt_iter_per_sec=round(res_throughput))

        # --- streamed: mmap shards -> device every iteration ---
        for prefetch in (1, 2):
            p1, _ = train_streaming(  # warmup (compiles the shard step)
                hmm, params0, reader, 1, count_kwargs=ckw, prefetch=prefetch
            )
            best = 1e9
            p = p1
            for _ in range(3):
                t0 = time.perf_counter()
                p, lls = train_streaming(
                    hmm, p, reader, args.iters, count_kwargs=ckw,
                    prefetch=prefetch,
                )
                best = min(best, time.perf_counter() - t0)
            thr = args.n * args.iters / best
            _record(out, kernel="stream_shards_em", n=args.n,
                    shard_size=args.shard_size, num_shards=n_shards,
                    prefetch=prefetch, iters=args.iters,
                    ms_per_iter=round(best / args.iters * 1e3, 3),
                    utt_iter_per_sec=round(thr),
                    overlap_efficiency=round(thr / res_throughput, 3))


if __name__ == "__main__":
    main()
