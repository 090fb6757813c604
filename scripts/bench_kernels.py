"""Per-kernel benchmark harness -> JSONL (regression tracking across rounds).

Covers the three Pallas kernels plus the EM steps; appends one record per
measurement to bench/results.jsonl.  Timings follow CLAUDE.md rules: fused
scans where applicable, host transfer of a fresh value inside the timed
region.

Usage: python scripts/bench_kernels.py [--out bench/results.jsonl]
"""

from __future__ import annotations

import argparse
import functools
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
        impls = [
            ("log_matmul_pallas", log_matmul_pallas),
            ("log_matmul_pallas_bf16",
             lambda x, y: log_matmul_pallas(x, y, dot_dtype="bfloat16")),
        ]
        if size <= 1024:  # the one-shot XLA form OOMs beyond this
            impls.append(("log_matmul_xla", log_matmul))
        ref = None
        for name, fn in impls:
            # chained: each iteration feeds the previous output back into A,
            # so the relay cannot ack-without-compute or replay (CLAUDE.md)
            def chained(x, y, fn=fn):
                def body(acc, _):
                    o = fn(acc, y)
                    return o - jnp.max(o) - 1.0, jnp.max(o)
                return jax.lax.scan(body, x, None, length=10)

            run = jax.jit(lambda x, y, f=chained: f(x, y))
            o, ms = run(a, b)
            jax.block_until_ready(o)
            t = time.perf_counter()
            o2, ms = run(o, b)  # replay-proof: timed input = warmup output
            _ = float(ms[-1])
            dt = (time.perf_counter() - t) / 10
            rec = dict(kernel=name, size=size, ms=round(dt * 1e3, 3),
                       gflops_equiv=round(2 * size**3 / dt / 1e9))
            if name == "log_matmul_pallas":
                ref = fn(a, b)
            if name == "log_matmul_pallas_bf16" and ref is not None:
                err = float(jnp.max(jnp.abs(fn(a, b) - ref)))
                rec["max_abs_log_err_vs_f32"] = round(err, 5)
            _record(out, **rec)


def bench_em(out):
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm, model1

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=8000, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )
    jobs = (
        ("model1_em", model1, {}),
        ("hmm_em", hmm, {}),
        ("hmm_em_fused", hmm, dict(use_pallas=True)),  # 3-kernel pipeline
    )
    # 100 chained iterations + best-of-3: at ~1 ms/iter a 20-iter window
    # lets the ~25 ms relay round-trip dominate (measured: model1 read 5.3
    # ms/iter at 20 iters vs its true 0.53 at 100)
    iters = 100
    for name, mod, kw in jobs:
        train = jax.jit(lambda p, m=mod, kw=kw: m.train(p, corpus, iters, **kw))
        p = mod.init(corpus)
        q, lls = train(p)
        jax.block_until_ready(q)
        dt = 1e9
        for _ in range(3):
            t = time.perf_counter()
            q2, lls = train(q)  # replay-proof: input differs from warmup
            _ = float(lls[-1])
            dt = min(dt, (time.perf_counter() - t) / iters)
        _record(out, kernel=name, ms_per_iter=round(dt * 1e3, 3),
                utt_iter_per_sec=round(8000 / dt))


def bench_counts(out):
    """One-hot contraction kernels (ops/counts_pallas.py) vs the XLA
    broadcast-k formulations (core/counts.py) on the headline shape.

    Chained via a carry perturbation (PERFORMANCE.md rule 6: an invariant
    scan body gets hoisted and every config reads the same number)."""
    from multimodalworddiscovery_tpu.core.counts import pair_counts, table_lookup
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm, hmm_core
    from multimodalworddiscovery_tpu.ops.counts_pallas import (
        pad_time_major, pair_counts_pallas, table_lookup_pallas,
    )
    from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
        _round_up, hmm_estep_pallas, pick_tiles,
    )

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=8000, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )
    params = hmm.init(corpus)
    concepts = hmm_core.state_concepts(corpus)
    n, ts = corpus.src.shape
    s = concepts.shape[1]
    f, e = params.log_emit.shape
    bn, tc = pick_tiles(ts, s, n)
    # count kernels assert block_t % 8 == 0 (or == tp); pick_tiles has
    # min_tc=1, so clamp block_t UP to 8 at VMEM-tight shapes and pad the
    # time axis to a multiple of both (tc, bt are powers of 2: lcm = max)
    bt = tc if tc % 8 == 0 else 8
    tp = _round_up(ts, max(tc, bt))
    s_pad = _round_up(s, 8)
    src_t = pad_time_major(corpus.src, tp, _round_up(n, bn))
    conc_t = pad_time_major(concepts, s_pad, _round_up(n, bn))
    null_rows = tuple(k >= corpus.max_trg_len for k in range(s_pad))
    log_emit = hmm._log_emissions(params, corpus)
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump)
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    gamma = jax.jit(lambda le: hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, le, corpus,
        use_pallas=True))(log_emit)[0]
    emit_t = table_lookup_pallas(
        params.log_emit, src_t, conc_t, k_real=s, block_n=bn, block_t=bt,
        null_rows=null_rows)
    gamma_t = jax.jit(lambda et: hmm_estep_pallas(
        log_init, base, rowz, colmask, et, corpus.src_len, block_n=bn,
        chunk_t=tc, emit_tn=True, out_tn=True, dims=(n, ts, s)))(emit_t)[0]
    reps = 50

    def chained(name, fn, carry0):
        run = jax.jit(lambda c0: jax.lax.scan(
            lambda c, _: (fn(c), None), c0, None, length=reps)[0])
        r = run(carry0)
        jax.block_until_ready(r)
        dt = 1e9
        for _ in range(3):  # best-of-3: single samples catch relay hiccups
            t = time.perf_counter()
            r = run(carry0)
            _ = float(jax.tree.leaves(r)[0].ravel()[0])
            dt = min(dt, (time.perf_counter() - t) / reps)
        _record(out, kernel=name, ms=round(dt * 1e3, 3), N=n, T=ts, S=s)

    chained("table_lookup_xla",
            lambda tab: tab + table_lookup(tab, corpus.src, concepts)[0, 0, 0] * 1e-30,
            params.log_emit)
    chained("table_lookup_pallas",
            lambda tab: tab + table_lookup_pallas(
                tab, src_t, conc_t, k_real=s, block_n=bn, block_t=bt,
                null_rows=null_rows)[0, 0, 0] * 1e-30,
            params.log_emit)
    chained("pair_counts_xla",
            lambda g: g + pair_counts(g, corpus.src, concepts, f, e)[0, 0] * 1e-30,
            gamma)
    chained("pair_counts_pallas",
            lambda g: g + pair_counts_pallas(
                g, src_t, conc_t, f, e, block_n=bn, block_t=bt,
                null_rows=null_rows)[0, 0] * 1e-30,
            gamma_t)


# TPU v5 lite (v5e) per-chip peaks for the MFU / bandwidth-fraction fields:
# 197 TFLOP/s bf16 MXU (fp32-HIGHEST dots decompose into ~6 bf16 passes, so
# their MXU ceiling is ~197/6 = 33 TFLOP/s), 819 GB/s HBM.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_F32_HIGHEST_PASSES = 6
V5E_PEAK_HBM_BYTES = 819e9


def _mfu_fields(n: int, ts: int, s: int, dt: float, dtype: str) -> dict:
    """Achieved FLOP/s and %-of-v5e-peak for one EM iteration at (N, Ts, S).

    FLOP model: the recursion's useful work is 3 log-semiring inner products
    per time step (forward, backward, xi), each an [S, S] x [S, N] matmul on
    max-rescaled exponentials -> 3 * 2 * S^2 * N * Ts FLOPs per iteration
    (lookup/count/M-step work excluded — it is O(S N Ts), a lower-order
    term).  HBM model: the fused pipeline streams the [Ts, S, N] emissions
    twice (fwd + bwd) and the alphas twice (write + re-read); gamma stays in
    VMEM (counts fused into the backward kernel), so ~4 * Ts * S * N * 4
    bytes per iteration.
    """
    flops = 6.0 * s * s * n * ts
    hbm_bytes = 4.0 * ts * s * n * 4
    mxu_peak = V5E_PEAK_BF16_FLOPS
    if dtype == "float32":
        mxu_peak = V5E_PEAK_BF16_FLOPS / V5E_F32_HIGHEST_PASSES
    return dict(
        flops_per_sec=round(flops / dt),
        pct_peak_mxu=round(100 * flops / dt / mxu_peak, 3),
        pct_peak_mxu_bf16=round(100 * flops / dt / V5E_PEAK_BF16_FLOPS, 3),
        hbm_bytes_per_sec=round(hbm_bytes / dt),
        pct_peak_hbm=round(100 * hbm_bytes / dt / V5E_PEAK_HBM_BYTES, 3),
    )


def bench_hmm_estep(out):
    """Fused Pallas E-step vs XLA scan path across state-space sizes.

    Timing: K chained EM iterations in ONE lax.scan dispatch (params feed
    back, so the relay cannot replay), host read of the final loglik.
    The large-S shapes are the config-#5 regime (S=64/128, Ts~128+) where the
    round-1 whole-resident kernel OOMed VMEM.  Pallas rows carry achieved
    FLOP/s + %-of-v5e-peak (``_mfu_fields``; VERDICT round-2 item 1).
    """
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm

    shapes = [
        # (label, n, concepts-range) -> S = 2*max_concepts-ish
        ("S12", dict(n_utterances=8000, n_concepts=60, n_phones=48,
                     min_concepts=3, max_concepts=6, seed=0)),
        ("S64", dict(n_utterances=1024, n_concepts=200, n_phones=48,
                     min_concepts=24, max_concepts=32, min_word_len=3,
                     max_word_len=5, seed=1)),
        ("S128", dict(n_utterances=512, n_concepts=400, n_phones=48,
                      min_concepts=48, max_concepts=64, min_word_len=2,
                      max_word_len=3, seed=2)),
    ]
    # 50 chained iterations: at 10 the ~30 ms fixed dispatch+host-read cost
    # of the axon relay still inflates ms/iter by ~3 ms (measured)
    iters = 50
    for label, gen in shapes:
        corpus, _, _ = make_flickr8k_mini(**gen)
        s = 2 * corpus.max_trg_len
        ts = corpus.max_src_len
        n = corpus.n
        variants = [
            ("hmm_estep_xla", dict(use_pallas=False)),
            ("hmm_estep_pallas", dict(use_pallas=True)),
            ("hmm_estep_pallas_bf16",
             dict(use_pallas=True, dot_dtype="bfloat16")),
        ]
        base_ll = None
        for name, kw in variants:
            train = jax.jit(lambda p, kw=kw: hmm.train(p, corpus, iters, **kw))
            p0 = hmm.init(corpus)
            p1, lls = train(p0)
            jax.block_until_ready(p1)
            t = time.perf_counter()
            # timed input = warmup OUTPUT: replay-proof (fresh request+values)
            p2, lls = train(p1)
            last = float(lls[-1])
            dt = (time.perf_counter() - t) / iters
            rec = dict(kernel=name, shape=label, S=s, Ts=ts, N=n,
                       ms_per_iter=round(dt * 1e3, 3),
                       utt_iter_per_sec=round(n / dt))
            if name != "hmm_estep_xla":
                rec.update(_mfu_fields(
                    n, ts, s, dt,
                    "bfloat16" if name.endswith("bf16") else "float32",
                ))
            if name == "hmm_estep_xla":
                base_ll = last
            elif base_ll is not None:
                rec["ll_rel_err_vs_xla"] = round(
                    abs(last - base_ll) / max(1.0, abs(base_ll)), 6
                )
            _record(out, **rec)


def bench_viterbi(out):
    """Decode throughput: factored (no [N,S,S], int8 backtrace) vs dense."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm, hmm_core

    def _factored_args(p, corpus):
        base, rowz, colmask = hmm_core.factor_log_trans(
            p.log_jump, p.log_p0, corpus, p.max_jump
        )
        log_init = hmm_core.build_log_init(p.log_p0, corpus)
        log_emit = hmm._log_emissions(p, corpus)
        return log_init, base, rowz, colmask, log_emit, corpus.src_len

    for label, gen in (
        ("S12", dict(n_utterances=8000, n_concepts=60, n_phones=48,
                     min_concepts=3, max_concepts=6, seed=0)),
        ("S128", dict(n_utterances=512, n_concepts=400, n_phones=48,
                      min_concepts=48, max_concepts=64, min_word_len=2,
                      max_word_len=3, seed=2)),
    ):
        corpus, _, _ = make_flickr8k_mini(**gen)
        s = 2 * corpus.max_trg_len
        params = hmm.init(corpus)
        params, _ = jax.jit(hmm.em_step)(params, corpus)

        def dense(p):
            li, lt, le = hmm._machinery(p, corpus)
            return hmm_core.viterbi(li, lt, le, corpus.src_len)

        def factored(p):
            return hmm.align(p, corpus)

        def fused(p):
            from multimodalworddiscovery_tpu.ops.viterbi_pallas import (
                viterbi_pallas,
            )

            base, rowz, colmask = hmm_core.factor_log_trans(
                p.log_jump, p.log_p0, corpus, p.max_jump
            )
            log_init = hmm_core.build_log_init(p.log_p0, corpus)
            log_emit = hmm._log_emissions(p, corpus)
            path = viterbi_pallas(
                log_init, base, rowz, colmask, log_emit, corpus.src_len
            )
            return hmm_core.path_to_alignment(path, corpus)

        ref_align = None
        for name, fn in (
            ("viterbi_dense", dense),
            ("viterbi_factored", factored),
            ("viterbi_pallas", fused),
        ):
            run = jax.jit(fn)
            a = run(params)
            jax.block_until_ready(a)
            # perturb params so the timed request differs from the warmup
            p2 = params.replace(log_emit=params.log_emit + 1e-6)
            t = time.perf_counter()
            a = run(p2)
            _ = int(jnp.sum(a % 7))  # fresh host scalar
            dt = time.perf_counter() - t
            rec = dict(kernel=name, shape=label, S=s, N=corpus.n,
                       ms=round(dt * 1e3, 3), utt_per_sec=round(corpus.n / dt))
            if name == "viterbi_factored":
                ref_align = np.asarray(hmm_core.path_to_alignment(
                    hmm_core.viterbi_factored(*_factored_args(params, corpus)),
                    corpus,
                ))
            if name == "viterbi_pallas" and ref_align is not None:
                rec["agree_vs_factored"] = round(
                    float((np.asarray(fused(params)) == ref_align).mean()), 5
                )
            _record(out, **rec)


def bench_model1_align(out):
    """Model-1 decode: concept-space argmax (_align_concept_space) vs the
    dense [N, Ts, 1+Tt] formulation (_align_dense) across target densities —
    the data behind ``align``'s shape dispatch (VERDICT round-2 item 7)."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import model1

    shapes = [
        ("Tt6", dict(n_utterances=8000, n_concepts=60, n_phones=48,
                     min_concepts=3, max_concepts=6, seed=0)),
        # MSCOCO/stretch-density regime: many concepts per image — where the
        # dense [N, Ts, 1+Tt] per-lane select should lose to concept space
        ("Tt32", dict(n_utterances=2048, n_concepts=200, n_phones=48,
                      min_concepts=24, max_concepts=32, min_word_len=3,
                      max_word_len=5, seed=1)),
    ]
    reps = 30
    for label, gen in shapes:
        corpus, _, _ = make_flickr8k_mini(**gen)
        params = model1.init(corpus)
        params, _ = jax.jit(lambda p: model1.train(p, corpus, 10))(params)
        ref = None
        for name, fn in (
            ("model1_align_dense", model1._align_dense),
            ("model1_align_concept_space", model1._align_concept_space),
        ):
            # chained: perturb the table from the alignment checksum so the
            # scan body is not loop-invariant (CLAUDE.md: hoisted bodies all
            # read the same number) and the relay cannot replay
            def chained(p, fn=fn):
                def body(q, _):
                    a = fn(q, corpus)
                    return q.replace(
                        log_t=q.log_t + jnp.float32(1e-12) * jnp.sum(a % 3)
                    ), jnp.sum(a)
                return jax.lax.scan(body, p, None, length=reps)

            run = jax.jit(chained)
            p1, sums = run(params)
            jax.block_until_ready(sums)
            dt = 1e9
            for _ in range(3):
                t = time.perf_counter()
                p1, sums = run(p1)  # timed input = previous output: each
                # rep is a byte-distinct request (no relay replay)
                _ = int(sums[-1])
                dt = min(dt, (time.perf_counter() - t) / reps)
            rec = dict(kernel=name, shape=label, N=corpus.n,
                       T=corpus.max_src_len, Tt=corpus.max_trg_len,
                       ms=round(dt * 1e3, 3), utt_per_sec=round(corpus.n / dt))
            if name == "model1_align_dense":
                ref = np.asarray(model1._align_dense(params, corpus))
            else:
                rec["agree_vs_dense"] = round(
                    float((np.asarray(fn(params, corpus)) == ref).mean()), 6
                )
            _record(out, **rec)


def _xla_flops(jitted_fn, *args) -> float | None:
    """FLOPs of one compiled call from XLA's own cost analysis — the
    auditable FLOP model for the gradient families (VERDICT round-3 item 6;
    no hand-derived transformer arithmetic to drift out of sync with the
    code).  Returns None when the backend exposes no analysis."""
    def analyze(*a):
        ca = jitted_fn.lower(*a).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        val = float(ca.get("flops", 0.0))
        return val if val > 0 else None

    try:
        return analyze(*args)
    except Exception:
        pass
    try:
        # remote-plugin backends may not expose cost_analysis: lower the
        # same SHAPES for the local CPU backend (FLOP counts are a property
        # of the HLO, not the chip)
        shapes = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype), args
        )
        with jax.default_device(jax.devices("cpu")[0]):
            return analyze(*shapes)
    except Exception:
        return None


def bench_models(out):
    """TPU throughput for the gradient model families: attention (minibatch
    steps/s at B=512), grounding (contrastive minibatch steps/s), hmm_crf
    (end-to-end differentiable aligner steps/s), segmental k-means (EM
    iters/s + discover utt/s).  Gradient rows carry flops_per_sec /
    pct_peak_mxu from XLA's cost analysis of one compiled step (VERDICT
    round-3 item 6).

    Replay-proof protocol: reps steps fused in ONE lax.scan dispatch with the
    model state threaded through the carry (the relay cannot ack-without-
    compute), timed input = warmup output, best-of-3, fresh host scalar read
    inside the timed region.
    """
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import (
        attention, grounding, hmm_crf, segmental_kmeans,
    )
    from multimodalworddiscovery_tpu.models.minibatch import gather_batch

    corpus, gold, _ = make_flickr8k_mini(
        n_utterances=8192, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )

    def bench_minibatch(name, step_fn, state0, c, batch, reps=20, **extra):
        n = c.n

        def body(s, k):
            idx = jax.random.permutation(k, n)[:batch]
            s2, stats = step_fn(s, gather_batch(c, idx))
            return s2, stats.get("loss", stats.get("loglik"))

        run = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))
        ks = jax.random.split(jax.random.PRNGKey(0), reps)
        s1, losses = run(state0, ks)
        jax.block_until_ready(losses)
        dt = 1e9
        for i in range(3):
            ks = jax.random.split(jax.random.PRNGKey(i + 1), reps)
            t = time.perf_counter()
            _, losses = run(s1, ks)
            _ = float(losses[-1])
            dt = min(dt, (time.perf_counter() - t) / reps)
        rec = dict(kernel=name, batch=batch, N=n,
                   ms_per_step=round(dt * 1e3, 3),
                   steps_per_sec=round(1 / dt, 1),
                   utt_per_sec=round(batch / dt), **extra)
        # FLOP model: XLA cost analysis of ONE compiled step (fwd+bwd+Adam).
        # Default matmul precision on TPU f32 runs the MXU's bf16 passes, so
        # the bf16 ceiling is the honest denominator.
        fl = _xla_flops(jax.jit(body), s1, ks[0])
        if fl:
            rec.update(
                flops_per_step=round(fl),
                flops_per_sec=round(fl / dt),
                pct_peak_mxu_bf16=round(100 * fl / dt / V5E_PEAK_BF16_FLOPS, 3),
            )
        _record(out, **rec)

    # --- attention aligner: B=512 minibatch AdamW steps (config #3/#4
    # protocol; the 40k-utterance CRF experiment used the same batch) ---
    att_state = attention.init(corpus, dim=128, key=jax.random.PRNGKey(0))
    bench_minibatch(
        "attention_minibatch_step", attention.em_step, att_state, corpus,
        batch=512, dim=128,
    )

    # --- grounding baseline: B=256 contrastive steps (the matchmap + margin
    # loss is O(B^2) pair scores; 256 is the production default regime) ---
    gr_state = grounding.init(corpus, dim=128, key=jax.random.PRNGKey(1))
    bench_minibatch(
        "grounding_minibatch_step", grounding.em_step, gr_state, corpus,
        batch=256, dim=128,
    )

    # --- hmm_crf: end-to-end differentiable aligner (n_sgd Adam steps
    # through the exact CRF marginal per call + closed-form transition
    # M-step) on continuous frames, minibatched like the neural models ---
    crf_tok, crf_gold, _ = make_flickr8k_mini(
        n_utterances=2048, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=4,
    )
    crf_fc, _, _ = phones_to_frames(
        crf_tok, crf_gold, feat_dim=13, noise=0.1, seed=4
    )
    crf_state = hmm_crf.init_e2e(crf_fc, key=jax.random.PRNGKey(3))
    bench_minibatch(
        "hmm_crf_minibatch_step",
        functools.partial(hmm_crf.em_step, learn_transitions=True),
        crf_state, crf_fc, batch=256,
    )

    # --- segmental k-means: full-corpus EM iterations + discover, on a
    # continuous frames corpus (its production input) ---
    tok, tok_gold, _ = make_flickr8k_mini(
        n_utterances=2000, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=3,
    )
    fc, _, _ = phones_to_frames(tok, tok_gold, feat_dim=13, noise=0.1, seed=3)
    skm_params = segmental_kmeans.init(
        fc, n_clusters=64, key=jax.random.PRNGKey(2)
    )
    reps = 20
    train = jax.jit(
        lambda p: segmental_kmeans.train(p, fc, reps)
    )
    p1, costs = train(skm_params)
    jax.block_until_ready(costs)
    dt = 1e9
    for _ in range(3):
        t = time.perf_counter()
        p1, costs = train(p1)  # timed input = previous output (no replay)
        _ = float(costs[-1])
        dt = min(dt, (time.perf_counter() - t) / reps)
    _record(out, kernel="segkmeans_em", N=fc.n, T=fc.max_src_len,
            ms_per_iter=round(dt * 1e3, 3), utt_iter_per_sec=round(fc.n / dt))

    disc = jax.jit(lambda p: segmental_kmeans.discover(p, fc))
    segs, mask = disc(p1)
    jax.block_until_ready(mask)
    dt = 1e9
    for i in range(3):
        p2 = p1.replace(centroids=p1.centroids + 1e-6 * (i + 1))  # fresh req
        t = time.perf_counter()
        segs, mask = disc(p2)
        nseg = int(jnp.sum(mask))  # fresh host scalar
        dt = min(dt, time.perf_counter() - t)
    _record(out, kernel="segkmeans_discover", N=fc.n, n_segments=nseg,
            ms=round(dt * 1e3, 3), utt_per_sec=round(fc.n / dt),
            segments_per_sec=round(nseg / dt))


def bench_retrieval(out):
    """TPU throughput for the pooled retrieval protocol (eval/retrieval.py)
    — the evaluation-side hot path at MSCOCO scale: scored (row, candidate)
    pairs/s for Model-1, the HMM family, and the grounding matchmap, in both
    directions (c2i image search / i2c annotation).

    Replay-proof: timed run perturbs the parameters (fresh request), fresh
    host scalar read of the score sum inside the timed region, best-of-3.
    """
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.eval.retrieval import (
        retrieval_scores_hmm_family_pooled,
        retrieval_scores_model1_pooled,
        sample_candidate_pools,
    )
    from multimodalworddiscovery_tpu.models import grounding, hmm, model1

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=8192, n_concepts=60, n_phones=48,
        min_concepts=3, max_concepts=6, seed=0,
    )
    pool = 32
    cand = sample_candidate_pools(corpus.n, pool, jax.random.PRNGKey(0))

    def timeit(name, fn, params, perturb, **extra):
        scores = fn(params)
        jax.block_until_ready(scores)
        dt = 1e9
        for i in range(3):
            p2 = perturb(params, 1e-6 * (i + 1))
            t = time.perf_counter()
            scores = fn(p2)
            _ = float(jnp.sum(scores))  # fresh host scalar
            dt = min(dt, time.perf_counter() - t)
        npairs = int(np.prod(scores.shape))
        _record(out, kernel=name, N=scores.shape[0], pool=scores.shape[1],
                ms=round(dt * 1e3, 3), pairs_per_sec=round(npairs / dt),
                **extra)

    m1 = model1.init(corpus)
    for direction in ("c2i", "i2c"):
        timeit(
            f"retrieval_model1_pooled_{direction}",
            jax.jit(lambda p, d=direction: retrieval_scores_model1_pooled(
                p, corpus, cand, batch_size=64, direction=d)),
            m1,
            lambda p, eps: p.replace(log_t=p.log_t + eps),
        )

    hp = hmm.init(corpus)
    for direction in ("c2i", "i2c"):
        timeit(
            f"retrieval_hmm_pooled_{direction}",
            jax.jit(lambda p, d=direction: retrieval_scores_hmm_family_pooled(
                hmm, p, corpus, cand, batch_size=32, direction=d)),
            hp,
            lambda p, eps: p.replace(log_emit=p.log_emit + eps),
        )

    gr = grounding.init(corpus, dim=128, key=jax.random.PRNGKey(1))

    def perturb_grounding(state, eps):
        return state.replace(
            params=jax.tree.map(lambda x: x + eps, state.params)
        )

    for direction in ("c2i", "i2c"):
        timeit(
            f"retrieval_grounding_pooled_{direction}",
            jax.jit(lambda s, d=direction: grounding.retrieval_scores_pooled(
                s, corpus, cand, batch_size=64, direction=d)),
            gr,
            perturb_grounding,
            dim=128,
        )


def bench_detector(out):
    """TPU throughput for the learned region-proposal detector
    (frontend/detector.py): minibatch train steps/s and propose images/s.

    Same replay-proof protocol as bench_models: reps steps fused in one
    lax.scan with (variables, opt_state) threaded through the carry,
    best-of-3, fresh host scalar read inside the timed region.
    """
    import optax

    from multimodalworddiscovery_tpu.data.synthetic import make_boxes_mini
    from multimodalworddiscovery_tpu.frontend import detector

    n, batch, reps = 512, 64, 20
    images, gt_boxes, gt_mask = make_boxes_mini(n_images=n, image_size=64)
    images = jnp.asarray(images)
    gt_boxes = jnp.asarray(gt_boxes)
    gt_mask = jnp.asarray(gt_mask)

    dcfg = detector.DetectorConfig(image_size=64)
    mod, variables = detector.init(dcfg, key=jax.random.PRNGKey(0))
    anchors = jnp.asarray(dcfg.anchors())
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(variables)

    _step = detector.make_train_step(mod, anchors, optimizer)

    def body(carry, k):
        v, o = carry
        idx = jax.random.permutation(k, n)[:batch]
        v, o, stats = _step(v, o, images[idx], gt_boxes[idx], gt_mask[idx])
        return (v, o), stats["loss"]

    run = jax.jit(lambda c, ks: jax.lax.scan(body, c, ks))
    carry = (variables, opt_state)
    carry, losses = run(carry, jax.random.split(jax.random.PRNGKey(0), reps))
    jax.block_until_ready(losses)
    dt = 1e9
    for i in range(3):
        ks = jax.random.split(jax.random.PRNGKey(i + 1), reps)
        t = time.perf_counter()
        _, losses = run(carry, ks)
        _ = float(losses[-1])
        dt = min(dt, (time.perf_counter() - t) / reps)
    _record(out, kernel="detector_train_step", batch=batch, N=n,
            image_size=64, ms_per_step=round(dt * 1e3, 3),
            steps_per_sec=round(1 / dt, 1),
            images_per_sec=round(batch / dt))

    v1 = carry[0]
    prop = jax.jit(
        lambda v, im: detector.propose(mod, v, anchors, im, k=8)
    )
    pb, ps, pk = prop(v1, images)
    jax.block_until_ready(pk)
    dt = 1e9
    for i in range(3):
        v2 = jax.tree.map(lambda x: x + 1e-6 * (i + 1), v1)  # fresh request
        t = time.perf_counter()
        pb, ps, pk = prop(v2, images)
        nkeep = int(jnp.sum(pk))  # fresh host scalar
        dt = min(dt, time.perf_counter() - t)
    _record(out, kernel="detector_propose", N=n, k=8, n_kept=nkeep,
            ms=round(dt * 1e3, 3), images_per_sec=round(n / dt))


BENCHES = ("mfcc", "log_matmul", "em", "counts", "hmm_estep", "viterbi",
           "models", "model1_align", "detector", "retrieval")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench/results.jsonl")
    ap.add_argument(
        "--only", nargs="*", choices=BENCHES,
        help="run a subset of the benchmarks (default: all)",
    )
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

    selected = args.only or BENCHES
    fns = dict(mfcc=bench_mfcc, log_matmul=bench_log_matmul, em=bench_em,
               counts=bench_counts, hmm_estep=bench_hmm_estep,
               viterbi=bench_viterbi, models=bench_models,
               model1_align=bench_model1_align, detector=bench_detector,
               retrieval=bench_retrieval)
    for name in selected:
        fns[name](out)


if __name__ == "__main__":
    main()
