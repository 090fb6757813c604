"""Per-kernel benchmark harness -> JSONL (regression tracking across rounds).

Covers the three Pallas kernels plus the EM steps; appends one record per
measurement to bench/results.jsonl.  Timings follow CLAUDE.md rules: fused
scans where applicable, host transfer of a fresh value inside the timed
region.

Usage: python scripts/bench_kernels.py [--out bench/results.jsonl]
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def _record(out_path, **rec):
    rec["ts"] = time.time()
    rec["device"] = str(jax.devices()[0])
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with out_path.open("a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


def bench_mfcc(out):
    from multimodalworddiscovery_tpu.frontend.speech import MfccConfig, extract
    from multimodalworddiscovery_tpu.ops.mfcc_pallas import extract_pallas

    rng = np.random.default_rng(0)
    wav = jnp.asarray((0.1 * rng.normal(size=(64, 48000))).astype(np.float32))
    lens = jnp.full((64,), 48000, jnp.int32)
    cfg = MfccConfig()
    for name, fn in (("mfcc_xla", extract), ("mfcc_pallas", extract_pallas)):
        f, _ = fn(wav, lens, cfg)
        jax.block_until_ready(f)
        t = time.perf_counter()
        for _ in range(20):
            f, _ = fn(wav, lens, cfg)
        _ = float(f[0, 0, 0])
        dt = (time.perf_counter() - t) / 20
        _record(out, kernel=name, ms=round(dt * 1e3, 3),
                audio_sec_per_sec=round(64 * 3 / dt))


def bench_log_matmul(out):
    from multimodalworddiscovery_tpu.core.logsemiring import log_matmul
    from multimodalworddiscovery_tpu.ops.log_semiring import log_matmul_pallas

    rng = np.random.default_rng(1)
    for size in (512, 1024, 2048):
        a = jnp.asarray((5 * rng.normal(size=(size, size))).astype(np.float32))
        b = jnp.asarray((5 * rng.normal(size=(size, size))).astype(np.float32))
        impls = [("log_matmul_pallas", log_matmul_pallas)]
        if size <= 1024:  # the one-shot XLA form OOMs beyond this
            impls.append(("log_matmul_xla", log_matmul))
        for name, fn in impls:
            o = fn(a, b)
            jax.block_until_ready(o)
            t = time.perf_counter()
            for _ in range(10):
                o = fn(a, b)
            _ = float(o[0, 0])
            dt = (time.perf_counter() - t) / 10
            _record(out, kernel=name, size=size, ms=round(dt * 1e3, 3),
                    gflops_equiv=round(2 * size**3 / dt / 1e9))


def bench_em(out):
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm, model1

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=8000, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )
    for name, mod in (("model1_em", model1), ("hmm_em", hmm)):
        train = jax.jit(lambda p, m=mod: m.train(p, corpus, 20))
        p = mod.init(corpus)
        q, lls = train(p)
        jax.block_until_ready(q)
        t = time.perf_counter()
        q, lls = train(p)
        _ = float(lls[-1])
        dt = (time.perf_counter() - t) / 20
        _record(out, kernel=name, ms_per_iter=round(dt * 1e3, 3),
                utt_iter_per_sec=round(8000 / dt))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench/results.jsonl")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    out = Path(args.out)
    # tunnel warm-up: the first heavy dispatch after connecting can stall for
    # seconds (axon relay); burn that on a throwaway loop so no benchmark
    # absorbs it
    x = jnp.ones((256, 256))
    for _ in range(50):
        x = x @ x * 1e-3
    _ = float(x[0, 0])

    bench_mfcc(out)
    bench_log_matmul(out)
    bench_em(out)


if __name__ == "__main__":
    main()
