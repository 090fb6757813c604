"""Fused Pallas HMM E-step: forward + backward + posteriors, time-chunked.

BASELINE.json north star: the HMM forward-backward recursion (SURVEY.md §3.2
🔥, the headline benchmark) as a Pallas kernel instead of a per-step XLA scan.

Design (round 2 — replaces the whole-[Ts,S,BN]-resident round-1 kernel that
OOMed VMEM at Ts=124, S=64):

1. **Factored transitions.** ``trans[n,s,s'] = base[s,s'] - rowz[n,s] +
   colmask[n,s']`` (models/hmm_core.py:factor_log_trans).  The kernel never
   sees an [N,S,S] tensor — O(S²) shared + O(N·S) per-lane terms only.

2. **MXU recursions.** With the factored form, one forward step is
   ``alpha'[s'] = log( Σ_s exp(base0[s,s']) · exp(a2[s] - m) ) + m + emit``
   — a plain f32 matmul on max-rescaled exponentials (all ≤ 1 because
   ``base0 = base - max(base)``), so the S² inner product runs on the MXU
   instead of the VPU.  Backward and the pooled transition-posterior
   accumulation (``xi_sum = Bexp ⊙ (Ea @ F^T)``) get the same treatment.
   Per CLAUDE.md, the f32 dots use ``precision=HIGHEST``; ``dot_dtype=
   'bfloat16'`` selects the faster bf16-input/f32-accumulate variant
   (inputs are ≤ 1 by construction — see docs/PERFORMANCE.md for the
   measured accuracy/MFU tradeoff).

3. **Time chunked through the grid.** grid = (N/BN, Ts/Tc); the time axis
   streams chunk-by-chunk with an [S, BN] carry in VMEM scratch (scratch
   persists across grid steps; the batch-block index is the outer, slower
   dimension).  Forward streams alphas to HBM; backward walks the chunks in
   reverse (index_map ``j -> n_chunks-1-j``), reading alpha chunks back and
   writing gamma chunks out.  VMEM residency is O(Tc·S·BN), so any (Ts, S)
   fits by shrinking Tc — there is no silent XLA fallback anymore.

Layout: batch on lanes (wide blocks, `pick_tiles`), states on sublanes.

Entry points:
- ``hmm_estep_pallas``: (gamma [N, Ts, S], xi_pooled [S, S], logZ [N]) —
  the general E-step (Gaussian/DNN/CRF emissions consume gamma).
- ``hmm_estep_counts_pallas``: (emit_counts [F, E], xi_pooled, logZ) for
  the discrete HMM — the (phone, concept) count accumulation runs INSIDE
  the backward sweep (``_bwd_counts_kernel``), so gamma never exists on
  HBM; emissions arrive pre-looked-up in lane-major layout from
  ops/counts_pallas.table_lookup_pallas (models/hmm.py chains the three
  kernels; measured ladder in docs/PERFORMANCE.md).

The jnp scans in models/hmm_core.py are the test oracle
(tests/test_hmm_estep_pallas.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pick_tiles_costed(
    ts: int,
    s: int,
    n: int | None,
    vmem_budget: int,
    chunk_coeff: int,
    fixed_coeff: tuple[int, int],
    lane_bytes_extra: int = 0,
    const_bytes: int = 0,
    min_tc: int = 1,
) -> tuple[int, int]:
    """Shared VMEM tiling search for the lane-major sequential kernels.

    Cost model (bytes): ``chunk_coeff * tc * s_pad * block_n * 4  +
    fixed_coeff[0] * s_pad^2 * 4 + fixed_coeff[1] * s_pad * block_n * 4 +
    lane_bytes_extra * block_n + const_bytes``.
    Prefer the WIDEST lane block that fits: the recursion is strictly
    sequential per utterance, so wall time ~ grid-steps x per-step latency,
    and per-step cost grows sub-linearly in block_n (measured on TPU v5e at
    S=64: bn=128 -> 4.5 ms/E-step, bn=256 -> 2.6, bn=512 -> 2.0; identical
    logz).  block_n is capped by the padded corpus size so tiny corpora
    don't burn pure-padding lanes.  min_tc: kernels carrying 2-D [tc, BN]
    blocks need tc % 8 == 0 for Mosaic's sublane block divisibility."""
    s_pad = _round_up(s, 8)
    n_cap = max(_round_up(n, 128), 128) if n is not None else 1 << 30
    for block_n in (1024, 512, 256, 128, 64, 32, 16, 8):
        if block_n > n_cap:
            continue
        fixed = (fixed_coeff[0] * s_pad * s_pad * 4
                 + fixed_coeff[1] * s_pad * block_n * 4
                 + lane_bytes_extra * block_n + const_bytes)
        for tc in (128, 64, 32, 16, 8, 4, 2, 1):
            if tc < min_tc:
                break
            if chunk_coeff * tc * s_pad * block_n * 4 + fixed <= vmem_budget:
                # never chunk wider than the (rounded) time axis: a Ts=16
                # corpus with tc=128 would pad/loop 8x pure-padding steps
                return block_n, min(tc, max(_round_up(ts, 8), min_tc))
    raise ValueError(f"no VMEM tiling for Ts={ts}, S={s}")  # S >~ 2800


def pick_tiles(
    ts: int, s: int, n: int | None = None, vmem_budget: int = 12 << 20
) -> tuple[int, int]:
    """(block_n, chunk_t) such that the backward pass (the VMEM-heaviest:
    emit + alphas in, gamma out, all double-buffered) fits the budget."""
    return pick_tiles_costed(ts, s, n, vmem_budget, 6, (2, 10))


def pick_tiles_fused(
    ts: int,
    s: int,
    n: int | None,
    f_pad: int,
    e_pad: int,
    n_real: int,
    vmem_budget: int = 12 << 20,
) -> tuple[int, int]:
    """(block_n, chunk_t) for the counts-fused backward kernel
    (``_bwd_counts_kernel``): on top of the E-step's chunk buffers it holds
    the [n_real+1, F, BN] phone-histogram scratch plus the one-hot/ge
    temporaries, all scaling with block_n — so the lane block shrinks when
    (n_real * f_pad) is large (e.g. S=32 with 128-phone vocab).  min_tc=8:
    the fused kernels carry 2-D [tc, BN] source-id blocks, and Mosaic
    requires the second-to-last block dim divisible by 8 (a tc=1 block at
    the VMEM edge fails to lower — caught compiled)."""
    return pick_tiles_costed(
        ts, s, n, vmem_budget, 4, (2, 10),
        lane_bytes_extra=((n_real + 3) * f_pad + e_pad) * 4,
        const_bytes=f_pad * e_pad * 4,
        min_tc=8,
    )


def _fwd_step(bexp, rowz, colmask, emit_t, alive, alpha, bf16):
    """One forward recursion step: alpha' = lse_s(alpha[s] + trans[s,s']) +
    emit, as an MXU matmul on max-rescaled exponentials."""
    a2 = alpha - rowz
    m = jnp.max(a2, axis=0)  # [BN]
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    e = jnp.exp(a2 - m_safe[None, :])  # ≤ 1
    if bf16:
        e = e.astype(jnp.bfloat16)
    # p[s', n] = Σ_s bexp[s, s'] · e[s, n]   (MXU)
    p = jax.lax.dot_general(
        bexp, e, (((0,), (0,)), ((), ())),
        precision=None if bf16 else _HI,
        preferred_element_type=jnp.float32,
    )
    upd = jnp.where(
        p > 0.0, jnp.log(jnp.maximum(p, 1e-38)) + m_safe[None, :], NEG_INF
    )
    upd = upd + emit_t + colmask
    return jnp.where(alive[None, :], upd, alpha)


def _bwd_math(bexp, bexp32, rowz, colmask, eb, alpha_t, t, lens, logz_safe,
              bf16):
    """Shared backward-step math for every backward kernel variant:
    (beta_t, gamma_t, xi_update) from the eb = emit[t+1] + beta[t+1] carry.
    ``_bwd_kernel`` / ``_bwd_counts_kernel`` / ``_bwd_remat_kernel`` differ
    only in where alphas come from and what consumes gamma."""
    ebm = eb + colmask
    m2 = jnp.max(ebm, axis=0)  # [BN]
    m2_safe = jnp.where(m2 > NEG_INF / 2, m2, 0.0)
    f = jnp.exp(ebm - m2_safe[None, :])  # ≤ 1
    fd = f.astype(jnp.bfloat16) if bf16 else f
    # q[s, n] = Σ_s' bexp[s, s'] · f[s', n]   (MXU)
    q = jax.lax.dot_general(
        bexp, fd, (((1,), (0,)), ((), ())),
        precision=None if bf16 else _HI,
        preferred_element_type=jnp.float32,
    )
    upd = jnp.where(
        q > 0.0, jnp.log(jnp.maximum(q, 1e-38)) + m2_safe[None, :], NEG_INF
    )
    upd = upd - rowz
    ended = ((t + 1) >= lens)[None, :]
    beta_t = jnp.where(ended, 0.0, upd)

    lg = alpha_t + beta_t - logz_safe[None, :]
    alive = (t < lens)[None, :]
    gamma_t = jnp.where(alive, jnp.exp(jnp.minimum(lg, 0.0)), 0.0)

    # xi(t -> t+1) pooled over (t, n):
    #   xi[s,s'] = exp(a2[s,n] + base0[s,s'] + ebm[s',n])
    #            = bexp[s,s'] · (Ea @ F^T)[s,s']
    # Ea = exp(a2 + m2) ≤ exp(range of base) — clamped for fp32 safety.
    tr_alive = ((t + 1) < lens)[None, :]
    a2 = alpha_t - rowz - logz_safe[None, :]
    ea = jnp.exp(jnp.minimum(a2 + m2_safe[None, :], 80.0))
    ea = jnp.where(tr_alive, ea, 0.0)
    ead = ea.astype(jnp.bfloat16) if bf16 else ea
    xc = jax.lax.dot_general(
        ead, fd, (((1,), (1,)), ((), ())),
        precision=None if bf16 else _HI,
        preferred_element_type=jnp.float32,
    )  # [S, S']
    return beta_t, gamma_t, bexp32 * xc


def _logz_from_alpha(alpha_last, lens):
    m = jnp.max(alpha_last, axis=0)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    z = jnp.log(jnp.sum(jnp.exp(alpha_last - m_safe[None, :]), axis=0) + 1e-38)
    z = jnp.where(m > NEG_INF / 2, z + m_safe, NEG_INF)
    return jnp.where(lens > 0, z, 0.0)


def _fwd_kernel(
    base_ref,     # [S, S]   base0 = base - max(base)  (shared)
    init_ref,     # [S, BN]
    rowz_ref,     # [S, BN]  rowz0 = rowz - max(base)
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]
    len_ref,      # [1, BN] int32
    alphas_ref,   # out [Tc, S, BN]
    logz_ref,     # out [1, BN]
    carry,        # scratch [S, BN]
    *,
    tc: int,
    n_chunks: int,
    bf16: bool,
):
    j = pl.program_id(1)
    lens = len_ref[0]
    bexp = jnp.exp(base_ref[:])  # ≤ 1
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]
    if bf16:
        bexp = bexp.astype(jnp.bfloat16)

    @pl.when(j == 0)
    def _():
        a0 = init_ref[:] + emit_ref[0]
        carry[:] = a0
        alphas_ref[0] = a0

    def body(i, alpha):
        t = j * tc + i
        alpha_new = _fwd_step(
            bexp, rowz, colmask, emit_ref[i], t < lens, alpha, bf16
        )
        alphas_ref[i] = alpha_new
        return alpha_new

    start = jnp.where(j == 0, 1, 0)
    alpha_last = jax.lax.fori_loop(start, tc, body, carry[:], unroll=False)
    carry[:] = alpha_last

    @pl.when(j == n_chunks - 1)
    def _():
        logz_ref[0] = _logz_from_alpha(alpha_last, lens)


def _fwd_ckpt_kernel(
    base_ref,     # [S, S]
    init_ref,     # [S, BN]
    rowz_ref,     # [S, BN]
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]
    len_ref,      # [1, BN]
    ckpt_ref,     # out [1, S, BN]: alpha ENTERING this chunk (garbage at j=0)
    logz_ref,     # out [1, BN]
    carry,        # scratch [S, BN]
    *,
    tc: int,
    n_chunks: int,
    bf16: bool,
):
    """Forward pass that stores only chunk-boundary alphas (rematerialized
    E-step: the backward kernel recomputes in-chunk alphas, eliminating the
    full [Ts,S,N] alpha HBM round-trip — the dominant traffic term at
    HBM-bound state sizes)."""
    j = pl.program_id(1)
    lens = len_ref[0]
    bexp = jnp.exp(base_ref[:])
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]
    if bf16:
        bexp = bexp.astype(jnp.bfloat16)

    @pl.when(j == 0)
    def _():
        carry[:] = init_ref[:] + emit_ref[0]
        ckpt_ref[0] = carry[:]  # unused by bwd (chunk 0 restarts from init)

    @pl.when(j > 0)
    def _():
        ckpt_ref[0] = carry[:]

    def body(i, alpha):
        t = j * tc + i
        return _fwd_step(bexp, rowz, colmask, emit_ref[i], t < lens, alpha, bf16)

    start = jnp.where(j == 0, 1, 0)
    alpha_last = jax.lax.fori_loop(start, tc, body, carry[:], unroll=False)
    carry[:] = alpha_last

    @pl.when(j == n_chunks - 1)
    def _():
        logz_ref[0] = _logz_from_alpha(alpha_last, lens)


def _bwd_kernel(
    base_ref,     # [S, S]  base0
    rowz_ref,     # [S, BN] rowz0
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]   (chunk n_chunks-1-j)
    alphas_ref,   # [Tc, S, BN]   (chunk n_chunks-1-j)
    len_ref,      # [1, BN]
    logz_ref,     # [1, BN]
    gamma_ref,    # out [Tc, S, BN]
    xi_ref,       # out [1, S, S]
    ebc,          # scratch [S, BN]: eb = emit[t+1] + beta[t+1] carry
    xi_acc,       # scratch [S, S]
    *,
    tc: int,
    n_chunks: int,
    bf16: bool,
):
    j = pl.program_id(1)
    c0 = (n_chunks - 1 - j) * tc
    lens = len_ref[0]
    logz = logz_ref[0]
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    bexp32 = jnp.exp(base_ref[:])
    bexp = bexp32.astype(jnp.bfloat16) if bf16 else bexp32
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]

    @pl.when(j == 0)
    def _():
        ebc[:] = jnp.full_like(ebc, NEG_INF)
        xi_acc[:] = jnp.zeros_like(xi_acc)

    def body(k, eb):
        i = tc - 1 - k
        t = c0 + i
        beta_t, gamma_t, xi_upd = _bwd_math(
            bexp, bexp32, rowz, colmask, eb, alphas_ref[i], t, lens,
            logz_safe, bf16,
        )
        gamma_ref[i] = gamma_t
        xi_acc[:] = xi_acc[:] + xi_upd
        return emit_ref[i] + beta_t

    eb_fin = jax.lax.fori_loop(0, tc, body, ebc[:], unroll=False)
    ebc[:] = eb_fin

    @pl.when(j == n_chunks - 1)
    def _():
        xi_ref[0] = xi_acc[:]


def _bwd_counts_kernel(
    base_ref,     # [S, S]  base0
    rowz_ref,     # [S, BN] rowz0
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]   (chunk n_chunks-1-j)
    alphas_ref,   # [Tc, S, BN]   (chunk n_chunks-1-j)
    src_ref,      # [Tc, BN] int32 (chunk n_chunks-1-j)
    conc_ref,     # [S, BN] int32
    len_ref,      # [1, BN]
    logz_ref,     # [1, BN]
    counts_ref,   # out [1, F, E]  (per-batch-block partial sums)
    xi_ref,       # out [1, S, S]
    ebc,          # scratch [S, BN]
    xi_acc,       # scratch [S, S]
    cnt_acc,      # scratch [F, E]
    ak_acc,       # scratch [n_real+1, F, BN] per-state phone histograms
    *,
    tc: int,
    n_chunks: int,
    bf16: bool,
    f_pad: int,
    e_pad: int,
    null_rows: tuple[bool, ...] | None,
):
    """Backward sweep with the (phone, concept) expected-count accumulation
    FUSED in: gamma is consumed in VMEM the step it is produced and never
    exists in HBM (the discrete HMM's M-step needs only the pooled counts).
    Identical beta/gamma/xi math to ``_bwd_kernel``.

    Count accumulation (null_rows given): the per-step work is one phone
    one-hot [F, BN] and n_real+1 fused multiply-adds into per-state phone
    HISTOGRAMS ``ak_acc[k][f, n] = sum_t 1[src=f] gamma[t,k,n]`` — the
    concept projection (per-lane concept ids) is DEFERRED to n_real+1 MXU
    dots once per batch block, so no [E, BN] masked selects and no per-step
    dot run inside the sequential loop.  Without null_rows it falls back to
    the per-step ge construction (ops/counts_pallas.py:_counts_kernel)."""
    j = pl.program_id(1)
    c0 = (n_chunks - 1 - j) * tc
    lens = len_ref[0]
    logz = logz_ref[0]
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    bexp32 = jnp.exp(base_ref[:])
    bexp = bexp32.astype(jnp.bfloat16) if bf16 else bexp32
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]
    s_pad = base_ref.shape[0]
    bn = rowz_ref.shape[1]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (f_pad, 1), 0)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (e_pad, 1), 0)
    real_ks = tuple(
        k for k in range(s_pad) if null_rows is None or not null_rows[k]
    )
    deferred = null_rows is not None
    n_real = len(real_ks)

    @pl.when(j == 0)
    def _():
        ebc[:] = jnp.full_like(ebc, NEG_INF)
        xi_acc[:] = jnp.zeros_like(xi_acc)
        cnt_acc[:] = jnp.zeros_like(cnt_acc)
        ak_acc[:] = jnp.zeros_like(ak_acc)

    def body(k, eb):
        i = tc - 1 - k
        t = c0 + i
        beta_t, gm, xi_upd = _bwd_math(
            bexp, bexp32, rowz, colmask, eb, alphas_ref[i], t, lens,
            logz_safe, bf16,
        )

        # --- fused (phone, concept) count accumulation (VMEM-resident) ---
        oh_src = (iota_f == src_ref[i][None, :]).astype(jnp.float32)
        if deferred:
            # per-state phone histograms; concept projection deferred
            null_sum = None
            for kk in range(s_pad):
                if null_rows[kk]:
                    g_row = gm[kk]
                    null_sum = g_row if null_sum is None else null_sum + g_row
            for idx, kk in enumerate(real_ks):
                ak_acc[idx] = ak_acc[idx] + oh_src * gm[kk][None, :]
            if null_sum is not None:
                ak_acc[n_real] = ak_acc[n_real] + oh_src * null_sum[None, :]
        else:
            ge = jnp.zeros((e_pad, bn), jnp.float32)
            for kk in range(s_pad):
                mask = (iota_e == conc_ref[kk][None, :]).astype(jnp.float32)
                ge = ge + mask * gm[kk][None, :]
            cnt_acc[:] = cnt_acc[:] + jax.lax.dot_general(
                oh_src, ge, (((1,), (1,)), ((), ())),
                precision=_HI, preferred_element_type=jnp.float32,
            )
        xi_acc[:] = xi_acc[:] + xi_upd
        return emit_ref[i] + beta_t

    eb_fin = jax.lax.fori_loop(0, tc, body, ebc[:], unroll=False)
    ebc[:] = eb_fin

    @pl.when(j == n_chunks - 1)
    def _():
        xi_ref[0] = xi_acc[:]
        if deferred:
            # project each state's phone histogram onto its concept column
            # (n_real+1 MXU dots, once per batch block)
            total = cnt_acc[:]  # zeros
            for idx, kk in enumerate(real_ks):
                ohc = (iota_e == conc_ref[kk][None, :]).astype(jnp.float32)
                total = total + jax.lax.dot_general(
                    ak_acc[idx], ohc, (((1,), (1,)), ((), ())),
                    precision=_HI, preferred_element_type=jnp.float32,
                )
            ohc0 = jnp.broadcast_to(
                (iota_e == 0).astype(jnp.float32), (e_pad, bn)
            )
            total = total + jax.lax.dot_general(
                ak_acc[n_real], ohc0, (((1,), (1,)), ((), ())),
                precision=_HI, preferred_element_type=jnp.float32,
            )
            counts_ref[0] = total
        else:
            counts_ref[0] = cnt_acc[:]


def _bwd_remat_kernel(
    base_ref,     # [S, S]  base0
    init_ref,     # [S, BN]
    rowz_ref,     # [S, BN] rowz0
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]   (chunk n_chunks-1-j)
    ckpt_ref,     # [1, S, BN]    alpha entering chunk n_chunks-1-j
    len_ref,      # [1, BN]
    logz_ref,     # [1, BN]
    gamma_ref,    # out [Tc, S, BN]
    xi_ref,       # out [1, S, S]
    alphas,       # scratch [Tc, S, BN]: rematerialized in-chunk alphas
    ebc,          # scratch [S, BN]
    xi_acc,       # scratch [S, S]
    *,
    tc: int,
    n_chunks: int,
    bf16: bool,
):
    """Backward pass with alpha REMATERIALIZATION: recompute the chunk's
    alphas from the boundary checkpoint (one extra matmul per step), then
    sweep beta/gamma/xi.  Trades ~33% more MXU work for eliminating the
    [Ts,S,N] alpha write+read — a win wherever the streaming kernel is
    HBM-bound (measured: see docs/PERFORMANCE.md)."""
    j = pl.program_id(1)
    c0 = (n_chunks - 1 - j) * tc
    lens = len_ref[0]
    logz = logz_ref[0]
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    bexp32 = jnp.exp(base_ref[:])
    bexp = bexp32.astype(jnp.bfloat16) if bf16 else bexp32
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]

    @pl.when(j == 0)
    def _():
        ebc[:] = jnp.full_like(ebc, NEG_INF)
        xi_acc[:] = jnp.zeros_like(xi_acc)

    # --- rematerialize this chunk's alphas from the boundary checkpoint ---
    first = init_ref[:] + emit_ref[0]  # only meaningful when c0 == 0

    def fwd_body(i, alpha):
        t = c0 + i
        stepped = _fwd_step(
            bexp, rowz, colmask, emit_ref[i], t < lens, alpha, bf16
        )
        alpha_new = jnp.where(t == 0, first, stepped)
        alphas[i] = alpha_new
        return alpha_new

    jax.lax.fori_loop(0, tc, fwd_body, ckpt_ref[0], unroll=False)

    # --- beta sweep + gamma + pooled xi (identical to the streaming bwd) ---
    def body(k, eb):
        i = tc - 1 - k
        t = c0 + i
        beta_t, gamma_t, xi_upd = _bwd_math(
            bexp, bexp32, rowz, colmask, eb, alphas[i], t, lens,
            logz_safe, bf16,
        )
        gamma_ref[i] = gamma_t
        xi_acc[:] = xi_acc[:] + xi_upd
        return emit_ref[i] + beta_t

    eb_fin = jax.lax.fori_loop(0, tc, body, ebc[:], unroll=False)
    ebc[:] = eb_fin

    @pl.when(j == n_chunks - 1)
    def _():
        xi_ref[0] = xi_acc[:]


def _prep_lane_major(log_init, base, rowz, colmask, src_len, n, s_pad, n_pad):
    """Shared small-tensor padding/transposes for the lane-major kernels:
    (base0 [S,S], init/rowz0/colmask [S,N], lens [1,N])."""
    maxbase = jnp.max(base)  # finite (NEG_INF slots never the max)
    base0 = jnp.maximum(base - maxbase, NEG_INF)

    def pad(x, shape, fill=NEG_INF):
        out = jnp.full(shape, fill, jnp.float32)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    base_p = pad(base0, (s_pad, s_pad))
    init_t = jnp.moveaxis(pad(log_init, (n_pad, s_pad)), 0, -1)
    rowz_t = jnp.moveaxis(pad(rowz - maxbase, (n_pad, s_pad), fill=0.0), 0, -1)
    colmask_t = jnp.moveaxis(pad(colmask, (n_pad, s_pad)), 0, -1)
    len_t = jnp.zeros((n_pad,), jnp.int32).at[:n].set(src_len)[None, :]
    return base_p, init_t, rowz_t, colmask_t, len_t


@functools.partial(
    jax.jit,
    static_argnames=("block_n", "chunk_t", "dot_dtype", "remat", "interpret",
                     "emit_tn", "out_tn", "dims"),
)
def hmm_estep_pallas(
    log_init: jax.Array,  # [N, S]
    base: jax.Array,      # [S, S]   shared jump-weight matrix
    rowz: jax.Array,      # [N, S]   per-row log normalizer
    colmask: jax.Array,   # [N, S]   0 valid / NEG_INF invalid states
    log_emit: jax.Array,  # [N, Ts, S] (or [Tp, Sp, Np] when emit_tn=True)
    src_len: jax.Array,   # [N]
    block_n: int | None = None,
    chunk_t: int | None = None,
    dot_dtype: str = "float32",
    remat: bool | None = None,
    interpret: bool = False,
    emit_tn: bool = False,
    out_tn: bool = False,
    dims: tuple[int, int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused E-step.  Returns (gamma [N, Ts, S], xi_pooled [S, S], logz [N]).

    Transitions come factored (models/hmm_core.py:factor_log_trans):
    ``trans[n,s,s'] = base[s,s'] - rowz[n,s] + colmask[n,s']``.  gamma is zero
    outside the valid (time, state) region; xi_pooled is the transition
    posterior summed over all t and n (per-jump-width projection is the
    caller's).  Any (Ts, S) fits VMEM via time chunking — no fallback path.

    remat=True stores only chunk-boundary alphas and recomputes in-chunk
    alphas in the backward sweep (+1 matmul/step for -8 bytes/step/state/lane
    of HBM traffic) — the right trade at HBM-bound state sizes.  Default
    (None) auto-selects by S (bench/results.jsonl).

    emit_tn=True: log_emit is already in padded kernel layout [Tp, Sp, Np]
    (e.g. straight from ops/counts_pallas.table_lookup_pallas) — no pad or
    transpose happens here; block_n/chunk_t must match the padding and
    `dims` must carry the real (n, ts, s).  out_tn=True returns gamma in
    the same padded layout (zero at all padding), skipping the moveaxis —
    together these keep the whole EM pipeline lane-major with no XLA-side
    round-trips of the [*, S, N]-sized tensors.
    """
    if emit_tn:
        assert dims is not None, "emit_tn=True requires dims=(n, ts, s)"
        n, ts, s = dims
    else:
        n, ts, s = log_emit.shape
    if block_n is None or chunk_t is None:
        auto_bn, auto_tc = pick_tiles(ts, s, n)
    bn = block_n or auto_bn
    tc = chunk_t or auto_tc
    bf16 = dot_dtype == "bfloat16"
    if remat is None:
        # Measured (bench/results.jsonl): within a full EM step the DMA
        # pipeline already hides the alpha stream behind the MXU work, so
        # recompute's extra matmul doesn't pay for the saved traffic at any
        # benched S — streaming stays the default.  remat remains available
        # for HBM-starved settings (e.g. sharing the chip with other work).
        remat = False

    s_pad = _round_up(s, 8)
    n_pad = _round_up(n, bn)
    ts_pad = _round_up(ts, tc)
    n_chunks = ts_pad // tc

    base_p, init_t, rowz_t, colmask_t, len_t = _prep_lane_major(
        log_init, base, rowz, colmask, src_len, n, s_pad, n_pad
    )
    if emit_tn:
        assert log_emit.shape == (ts_pad, s_pad, n_pad), (
            log_emit.shape, (ts_pad, s_pad, n_pad))
        emit_t = log_emit
    else:
        emit_p = jnp.full((n_pad, ts_pad, s_pad), NEG_INF, jnp.float32)
        emit_p = emit_p.at[:n, :ts, :s].set(log_emit)
        emit_t = jnp.moveaxis(emit_p, 0, -1)  # [Ts, S, N]

    grid = (n_pad // bn, n_chunks)
    kw = dict(tc=tc, n_chunks=n_chunks, bf16=bf16)

    spec_sn = pl.BlockSpec((s_pad, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_1n = pl.BlockSpec((1, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_base = pl.BlockSpec(
        (s_pad, s_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    spec_chunk = pl.BlockSpec(
        (tc, s_pad, bn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )
    spec_chunk_rev = pl.BlockSpec(
        (tc, s_pad, bn),
        lambda i, j: (n_chunks - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )

    spec_xi = pl.BlockSpec(
        (1, s_pad, s_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_ckpt = pl.BlockSpec(
        (1, s_pad, bn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )
    spec_ckpt_rev = pl.BlockSpec(
        (1, s_pad, bn),
        lambda i, j: (n_chunks - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )

    if remat:
        ckpt, logz = pl.pallas_call(
            functools.partial(_fwd_ckpt_kernel, **kw),
            out_shape=(
                jax.ShapeDtypeStruct((n_chunks, s_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            ),
            grid=grid,
            in_specs=[spec_base, spec_sn, spec_sn, spec_sn, spec_chunk, spec_1n],
            out_specs=(spec_ckpt, spec_1n),
            scratch_shapes=[pltpu.VMEM((s_pad, bn), jnp.float32)],
            interpret=interpret,
        )(base_p, init_t, rowz_t, colmask_t, emit_t, len_t)

        gamma, xi = pl.pallas_call(
            functools.partial(_bwd_remat_kernel, **kw),
            out_shape=(
                jax.ShapeDtypeStruct((ts_pad, s_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((grid[0], s_pad, s_pad), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                spec_base, spec_sn, spec_sn, spec_sn, spec_chunk_rev,
                spec_ckpt_rev, spec_1n, spec_1n,
            ],
            out_specs=(spec_chunk_rev, spec_xi),
            scratch_shapes=[
                pltpu.VMEM((tc, s_pad, bn), jnp.float32),
                pltpu.VMEM((s_pad, bn), jnp.float32),
                pltpu.VMEM((s_pad, s_pad), jnp.float32),
            ],
            interpret=interpret,
        )(base_p, init_t, rowz_t, colmask_t, emit_t, ckpt, len_t, logz)
    else:
        alphas, logz = pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            out_shape=(
                jax.ShapeDtypeStruct((ts_pad, s_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            ),
            grid=grid,
            in_specs=[spec_base, spec_sn, spec_sn, spec_sn, spec_chunk, spec_1n],
            out_specs=(spec_chunk, spec_1n),
            scratch_shapes=[pltpu.VMEM((s_pad, bn), jnp.float32)],
            interpret=interpret,
        )(base_p, init_t, rowz_t, colmask_t, emit_t, len_t)

        gamma, xi = pl.pallas_call(
            functools.partial(_bwd_kernel, **kw),
            out_shape=(
                jax.ShapeDtypeStruct((ts_pad, s_pad, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((grid[0], s_pad, s_pad), jnp.float32),
            ),
            grid=grid,
            in_specs=[
                spec_base, spec_sn, spec_sn, spec_chunk_rev, spec_chunk_rev,
                spec_1n, spec_1n,
            ],
            out_specs=(spec_chunk_rev, spec_xi),
            scratch_shapes=[
                pltpu.VMEM((s_pad, bn), jnp.float32),
                pltpu.VMEM((s_pad, s_pad), jnp.float32),
            ],
            interpret=interpret,
        )(base_p, rowz_t, colmask_t, emit_t, alphas, len_t, logz)

    xi_pooled = jnp.sum(xi, axis=0)[:s, :s]
    if not out_tn:
        gamma = jnp.moveaxis(gamma, -1, 0)[:n, :ts, :s]  # [N, Ts, S]
    return gamma, xi_pooled, logz[0, :n]


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "n_cols", "block_n", "chunk_t", "dot_dtype",
                     "null_rows", "interpret", "dims"),
)
def hmm_estep_counts_pallas(
    log_init: jax.Array,   # [N, S]
    base: jax.Array,       # [S, S]
    rowz: jax.Array,       # [N, S]
    colmask: jax.Array,    # [N, S]
    emit_t: jax.Array,     # [Tp, Sp, Np] padded lane-major emissions
    src_t: jax.Array,      # [Tp, Np] int32 time-major source ids
    conc_t: jax.Array,     # [Sp, Np] int32 state->concept ids
    src_len: jax.Array,    # [N]
    n_rows: int,
    n_cols: int,
    block_n: int,
    chunk_t: int,
    dot_dtype: str = "float32",
    null_rows: tuple[bool, ...] | None = None,
    interpret: bool = False,
    dims: tuple[int, int, int] | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """E-step with the (phone, concept) count accumulation fused into the
    backward kernel: returns (emit_counts [n_rows, n_cols], xi_pooled
    [S, S], logz [N]) and NEVER materializes gamma — the backward sweep
    consumes each step's posteriors in VMEM (``_bwd_counts_kernel``).

    Inputs come pre-padded in the lane-major layout (the
    ``_expected_counts_fused`` pipeline, models/hmm.py); dims = (n, ts, s).
    """
    assert dims is not None
    n, ts, s = dims
    bn, tc = block_n, chunk_t
    bf16 = dot_dtype == "bfloat16"
    s_pad = _round_up(s, 8)
    n_pad = _round_up(n, bn)
    ts_pad = _round_up(ts, tc)
    n_chunks = ts_pad // tc
    assert emit_t.shape == (ts_pad, s_pad, n_pad), emit_t.shape
    # 2-D [tc, BN] source-id blocks: Mosaic needs tc % 8 == 0 (or full)
    assert tc % 8 == 0 or tc == ts_pad, tc
    f_pad, e_pad = _round_up(n_rows, 8), _round_up(n_cols, 8)

    base_p, init_t, rowz_t, colmask_t, len_t = _prep_lane_major(
        log_init, base, rowz, colmask, src_len, n, s_pad, n_pad
    )

    grid = (n_pad // bn, n_chunks)
    kw = dict(tc=tc, n_chunks=n_chunks, bf16=bf16)

    spec_sn = pl.BlockSpec((s_pad, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_1n = pl.BlockSpec((1, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_base = pl.BlockSpec(
        (s_pad, s_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    spec_chunk = pl.BlockSpec(
        (tc, s_pad, bn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )
    spec_chunk_rev = pl.BlockSpec(
        (tc, s_pad, bn),
        lambda i, j: (n_chunks - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )
    spec_src_rev = pl.BlockSpec(
        (tc, bn), lambda i, j: (n_chunks - 1 - j, i), memory_space=pltpu.VMEM
    )
    spec_xi = pl.BlockSpec(
        (1, s_pad, s_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec_counts = pl.BlockSpec(
        (1, f_pad, e_pad), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )

    alphas, logz = pl.pallas_call(
        functools.partial(_fwd_kernel, **kw),
        out_shape=(
            jax.ShapeDtypeStruct((ts_pad, s_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[spec_base, spec_sn, spec_sn, spec_sn, spec_chunk, spec_1n],
        out_specs=(spec_chunk, spec_1n),
        scratch_shapes=[pltpu.VMEM((s_pad, bn), jnp.float32)],
        interpret=interpret,
    )(base_p, init_t, rowz_t, colmask_t, emit_t, len_t)

    # without null_rows the kernel uses the per-step ge construction and
    # never touches ak_acc — keep its scratch at the 1-row minimum so the
    # fallback cannot blow the VMEM budget pick_tiles_fused validated
    n_real = (
        sum(1 for r in null_rows if not r) if null_rows is not None else 0
    )
    counts, xi = pl.pallas_call(
        functools.partial(
            _bwd_counts_kernel, **kw, f_pad=f_pad, e_pad=e_pad,
            null_rows=null_rows,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], f_pad, e_pad), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], s_pad, s_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            spec_base, spec_sn, spec_sn, spec_chunk_rev, spec_chunk_rev,
            spec_src_rev,
            pl.BlockSpec((s_pad, bn), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            spec_1n, spec_1n,
        ],
        out_specs=(spec_counts, spec_xi),
        scratch_shapes=[
            pltpu.VMEM((s_pad, bn), jnp.float32),
            pltpu.VMEM((s_pad, s_pad), jnp.float32),
            pltpu.VMEM((f_pad, e_pad), jnp.float32),
            pltpu.VMEM((n_real + 1, f_pad, bn), jnp.float32),
        ],
        interpret=interpret,
    )(base_p, rowz_t, colmask_t, emit_t, alphas, src_t, conc_t, len_t, logz)

    emit_counts = jnp.sum(counts, axis=0)[:n_rows, :n_cols]
    xi_pooled = jnp.sum(xi, axis=0)[:s, :s]
    return emit_counts, xi_pooled, logz[0, :n]
