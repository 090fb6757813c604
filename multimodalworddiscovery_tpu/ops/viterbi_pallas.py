"""Fused Pallas Viterbi decode: max-plus forward + recompute backtrace.

Reference counterpart: the per-utterance ``viterbi`` loops of the HMM word
discoverers (SURVEY.md §3.2 "align()/viterbi(): per-utterance max-product
DP").  The batched XLA scan decoder (models/hmm_core.py:viterbi_factored) is
already corpus-scale; this kernel attacks its remaining wall — per-scan-step
latency on the strictly sequential recursion (the same regime the fused
E-step kernel wins in, see ops/hmm_fwdbwd_pallas.py and
docs/PERFORMANCE.md "Sequential recursions are latency-bound").

Design:

1. **No backpointers.**  The forward pass stores only the delta chunks
   (f32 [Tc, S, BN] streamed to HBM — the same traffic shape as the E-step's
   alphas).  The backtrace RECOMPUTES each step's winning predecessor from
   the stored deltas:

       prev[n] = argmax_s( delta_{t-1}[s,n] - rowz[s,n] + base[s, state[n]] )

   where ``base[:, state[n]]`` is selected per lane by a one-hot MXU matmul
   (``base @ onehot(state)`` — exact under HIGHEST, per the repo's one-hot
   lookup rule) followed by a [S, BN] sublane argmax.  This replaces the
   [Ts, N, S] backpointer tensor AND its per-step gather with one small
   matmul per step.

2. **Max-plus contraction on the VPU.**  ``delta'[s'] = max_s(d2[s] +
   base[s,s'])`` has no MXU form; it runs as a statically unrolled loop over
   8-sublane blocks of s, keeping the [8, S, BN] broadcast temporary small.

3. Same layout/grid as the E-step kernel: batch on lanes (wide blocks —
   latency-bound recursion), states on sublanes, time chunked through the
   grid with an [S, BN] carry in scratch; frozen-carry masking past each
   utterance's length (identical semantics to ``viterbi_factored``, which is
   this kernel's test oracle; ties can flip between equally-optimal paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
    _round_up,
    pick_tiles_costed,
)

_HI = jax.lax.Precision.HIGHEST


def pick_tiles_viterbi(
    ts: int, s: int, n: int | None = None, vmem_budget: int = 12 << 20
) -> tuple[int, int]:
    """(block_n, chunk_t) for the Viterbi kernels.  The forward pass is the
    VMEM-heaviest: emit + delta chunks double-buffered, plus the [8, S, BN]
    max-plus broadcast temporary (shared search: pick_tiles_costed)."""
    return pick_tiles_costed(ts, s, n, vmem_budget, 4, (1, 14))


def _maxplus_step(base, rowz, colmask, emit_t, alive, delta, s_pad):
    """delta'[s'] = max_s(delta[s] - rowz[s] + base[s, s']) + colmask + emit."""
    d2 = delta - rowz  # [S, BN]
    x = jnp.full_like(delta, NEG_INF)
    for k in range(s_pad // 8):
        blk = d2[k * 8:(k + 1) * 8]              # [8, BN]
        bas = base[k * 8:(k + 1) * 8]            # [8, S]
        cand = blk[:, None, :] + bas[:, :, None]  # [8, S, BN]
        x = jnp.maximum(x, jnp.max(cand, axis=0))
    upd = x + colmask + emit_t
    return jnp.where(alive[None, :], upd, delta)


def _vit_fwd_kernel(
    base_ref,     # [S, S]
    init_ref,     # [S, BN]
    rowz_ref,     # [S, BN]
    colmask_ref,  # [S, BN]
    emit_ref,     # [Tc, S, BN]
    len_ref,      # [1, BN] int32
    deltas_ref,   # out [Tc, S, BN]
    carry,        # scratch [S, BN]
    *,
    tc: int,
    s_pad: int,
):
    j = pl.program_id(1)
    lens = len_ref[0]
    base = base_ref[:]
    rowz = rowz_ref[:]
    colmask = colmask_ref[:]

    @pl.when(j == 0)
    def _():
        d0 = init_ref[:] + emit_ref[0]
        carry[:] = d0
        deltas_ref[0] = d0

    def body(i, delta):
        t = j * tc + i
        delta_new = _maxplus_step(
            base, rowz, colmask, emit_ref[i], t < lens, delta, s_pad
        )
        deltas_ref[i] = delta_new
        return delta_new

    start = jnp.where(j == 0, 1, 0)
    carry[:] = jax.lax.fori_loop(start, tc, body, carry[:], unroll=False)


def _vit_bwd_kernel(
    base_ref,     # [S, S]
    rowz_ref,     # [S, BN]
    deltas_ref,   # [Tc, S, BN]   (chunk n_chunks-1-j)
    dprev_ref,    # [1, S, BN]    last delta of chunk n_chunks-2-j (garbage at the first chunk)
    len_ref,      # [1, BN]
    path_ref,     # out [Tc, 1, BN] int32
    state,        # scratch [1, BN] int32
    *,
    tc: int,
    n_chunks: int,
    s_pad: int,
):
    j = pl.program_id(1)
    c0 = (n_chunks - 1 - j) * tc
    lens = len_ref[0]
    base = base_ref[:]
    rowz = rowz_ref[:]
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (s_pad, 1), 0)  # [S, 1]

    @pl.when(j == 0)
    def _():
        # delta is frozen past each utterance's length, so the final chunk's
        # last delta IS delta_{len-1} for every lane
        state[0] = jnp.argmax(deltas_ref[tc - 1], axis=0).astype(jnp.int32)

    def body(k, st):
        i = tc - 1 - k
        t = c0 + i
        path_ref[i] = st[None, :]
        # predecessor of st at time t (only meaningful for 0 < t < len)
        onehot = (iota_s == st[None, :]).astype(jnp.float32)  # [S, BN]
        bcol = jax.lax.dot_general(
            base, onehot, (((1,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )  # [S, BN] = base[:, st[n]]
        dprev = jnp.where(i == 0, dprev_ref[0], deltas_ref[jnp.maximum(i - 1, 0)])
        score = dprev - rowz + bcol
        prev = jnp.argmax(score, axis=0).astype(jnp.int32)
        keep = (t <= 0) | (t >= lens)
        return jnp.where(keep, st, prev)

    state[0] = jax.lax.fori_loop(0, tc, body, state[0], unroll=False)


@functools.partial(
    jax.jit, static_argnames=("block_n", "chunk_t", "interpret")
)
def viterbi_pallas(
    log_init: jax.Array,  # [N, S]
    base: jax.Array,      # [S, S]
    rowz: jax.Array,      # [N, S]
    colmask: jax.Array,   # [N, S]
    log_emit: jax.Array,  # [N, Ts, S]
    src_len: jax.Array,   # [N]
    block_n: int | None = None,
    chunk_t: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused Viterbi decode from factored transitions -> path [N, Ts] int32.

    Same contract as models/hmm_core.py:viterbi_factored (the test oracle);
    entries past src_len are frozen-carry states, masked downstream by
    ``path_to_alignment`` exactly as for the scan decoder.
    """
    n, ts, s = log_emit.shape
    if block_n is None or chunk_t is None:
        auto_bn, auto_tc = pick_tiles_viterbi(ts, s, n)
    bn = block_n or auto_bn
    tc = chunk_t or auto_tc

    s_pad = _round_up(s, 8)
    n_pad = _round_up(n, bn)
    ts_pad = _round_up(ts, tc)
    n_chunks = ts_pad // tc

    def pad(x, shape, fill=NEG_INF):
        out = jnp.full(shape, fill, jnp.float32)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    base_p = pad(base, (s_pad, s_pad))
    init_p = pad(log_init, (n_pad, s_pad))
    rowz_p = pad(rowz, (n_pad, s_pad), fill=0.0)
    colmask_p = pad(colmask, (n_pad, s_pad))
    emit_p = pad(log_emit, (n_pad, ts_pad, s_pad))
    len_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(src_len)

    init_t = jnp.moveaxis(init_p, 0, -1)
    rowz_t = jnp.moveaxis(rowz_p, 0, -1)
    colmask_t = jnp.moveaxis(colmask_p, 0, -1)
    emit_t = jnp.moveaxis(emit_p, 0, -1)  # [Ts, S, N]
    len_t = len_p[None, :]

    grid = (n_pad // bn, n_chunks)

    spec_sn = pl.BlockSpec((s_pad, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_1n = pl.BlockSpec((1, bn), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    spec_base = pl.BlockSpec(
        (s_pad, s_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM
    )
    spec_chunk = pl.BlockSpec(
        (tc, s_pad, bn), lambda i, j: (j, 0, i), memory_space=pltpu.VMEM
    )

    deltas = pl.pallas_call(
        functools.partial(_vit_fwd_kernel, tc=tc, s_pad=s_pad),
        out_shape=jax.ShapeDtypeStruct((ts_pad, s_pad, n_pad), jnp.float32),
        grid=grid,
        in_specs=[spec_base, spec_sn, spec_sn, spec_sn, spec_chunk, spec_1n],
        out_specs=spec_chunk,
        scratch_shapes=[pltpu.VMEM((s_pad, bn), jnp.float32)],
        interpret=interpret,
    )(base_p, init_t, rowz_t, colmask_t, emit_t, len_t)

    spec_chunk_rev = pl.BlockSpec(
        (tc, s_pad, bn),
        lambda i, j: (n_chunks - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )
    # last delta row of the PRECEDING chunk (for the i==0 backtrace step);
    # clamped at chunk 0, where t==0 needs no predecessor anyway
    spec_boundary = pl.BlockSpec(
        (1, s_pad, bn),
        lambda i, j: (jnp.maximum(n_chunks - 1 - j, 1) * tc - 1, 0, i),
        memory_space=pltpu.VMEM,
    )
    spec_path = pl.BlockSpec(
        (tc, 1, bn),
        lambda i, j: (n_chunks - 1 - j, 0, i),
        memory_space=pltpu.VMEM,
    )

    path = pl.pallas_call(
        functools.partial(
            _vit_bwd_kernel, tc=tc, n_chunks=n_chunks, s_pad=s_pad
        ),
        out_shape=jax.ShapeDtypeStruct((ts_pad, 1, n_pad), jnp.int32),
        grid=grid,
        in_specs=[
            spec_base, spec_sn, spec_chunk_rev, spec_boundary, spec_1n,
        ],
        out_specs=spec_path,
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.int32)],
        interpret=interpret,
    )(base_p, rowz_t, deltas, deltas, len_t)

    return jnp.moveaxis(path[:, 0, :], 0, 1)[:n, :ts]
