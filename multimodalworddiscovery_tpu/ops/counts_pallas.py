"""Fused Pallas one-hot contraction kernels for the EM count pipeline.

Reference counterpart: the per-utterance dictionary/count updates of the EM
M-steps (SURVEY.md §3.1/§3.2 "expected counts accumulated per utterance").
The batched XLA formulation (core/counts.py) replaced those Python loops
with one-hot MXU einsums; these kernels remove that formulation's remaining
HBM traffic — the materialized one-hot operands and intermediates, ~110 MB
per EM iteration at the bench shape vs ~16 MB of actual inputs (measured
breakdown in docs/PERFORMANCE.md).

Two kernels, sharing the E-step kernel's lane-major layout (batch on lanes,
states/vocab on sublanes, time through the grid) so the discrete-HMM EM
step can run table-lookup -> forward-backward -> pair-counts entirely in
kernel layout with no XLA-side transposes of the big [*, S, N] tensors:

1. ``table_lookup_pallas``:  emit[t, k, n] = table[src[t,n], concepts[k,n]]
   — one-hot row select as an MXU matmul (``table^T @ onehot(src_t)``,
   exact under HIGHEST) + per-k masked sublane reductions, generated
   in-VMEM (the one-hots never exist in HBM).

2. ``pair_counts_pallas``:  counts[f, e] += gamma[t, k, n] over all (t, n)
   with f = src[t,n], e = concepts[k,n] — the k-scatter becomes K unrolled
   lane-broadcast masked adds into a [E, BN] block, and the (f, e) outer
   accumulation one MXU contraction over lanes per time row.

Zero-padding contract: gamma must be 0 at padded states/lanes/times (the
E-step kernels guarantee this), so padded entries contribute nothing.

The XLA formulations in core/counts.py are the test oracle
(tests/test_counts_pallas.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import _round_up

_HI = jax.lax.Precision.HIGHEST


def _lookup_kernel(
    table_ref,     # [F, E] f32
    src_ref,       # [TB, BN] int32
    conc_ref,      # [K, BN] int32
    emit_ref,      # out [TB, K, BN] f32
    *,
    tb: int,
    k_pad: int,
    k_real: int,
    e_pad: int,
    f_pad: int,
    null_rows: tuple[bool, ...] | None,
):
    table = table_ref[:]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (f_pad, 1), 0)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (e_pad, 1), 0)
    neg = jnp.full((conc_ref.shape[1],), NEG_INF, jnp.float32)
    for tt in range(tb):
        src_row = src_ref[tt]  # [BN]
        oh_src = (iota_f == src_row[None, :]).astype(jnp.float32)  # [F, BN]
        # rows[e, n] = table[src[n], e]   (MXU; exact: single-term one-hot sum)
        rows = jax.lax.dot_general(
            table, oh_src, (((0,), (0,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )  # [E, BN]
        outs = []
        for k in range(k_pad):
            if k >= k_real:
                outs.append(neg)  # padded states: NEG_INF emissions
            elif null_rows is not None and null_rows[k]:
                # NULL state: concept id is 0 for every lane — the select
                # is just rows[0] (half the states in the paired-NULL
                # space, so this halves the masked-select VPU work)
                outs.append(rows[0])
            else:
                mask = (iota_e == conc_ref[k][None, :]).astype(jnp.float32)
                outs.append(jnp.sum(mask * rows, axis=0))  # [BN]
        emit_ref[tt] = jnp.stack(outs, axis=0)


@functools.partial(
    jax.jit, static_argnames=("k_real", "block_n", "block_t", "null_rows",
                              "interpret")
)
def table_lookup_pallas(
    table: jax.Array,    # [F, E] f32
    src_t: jax.Array,    # [Tp, Np] int32 (time-major source ids, padded)
    concepts_t: jax.Array,  # [Kp, Np] int32 (padded state->concept ids)
    k_real: int,
    block_n: int = 1024,
    block_t: int = 8,
    null_rows: tuple[bool, ...] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """emit[t, k, n] = table[src_t[t, n], concepts_t[k, n]] -> [Tp, Kp, Np].

    Inputs must already be padded: Tp % block_t == 0, Np % block_n == 0,
    Kp a multiple of 8 with rows k >= k_real ignored (their output is
    NEG_INF, matching the E-step kernels' padded-state convention).

    null_rows: optional static per-k flags marking rows whose concept id is
    0 for EVERY lane (the paired-NULL states, hmm_core.state_positions) —
    those skip the masked select entirely.
    """
    f, e = table.shape
    f_pad, e_pad = _round_up(f, 8), _round_up(e, 8)
    tp, np_ = src_t.shape
    k_pad = concepts_t.shape[0]
    assert tp % block_t == 0 and np_ % block_n == 0, (tp, np_)
    # Mosaic: 2-D [block_t, block_n] blocks need block_t % 8 == 0 (or full)
    assert block_t % 8 == 0 or block_t == tp, block_t

    table_p = jnp.zeros((f_pad, e_pad), jnp.float32)
    table_p = table_p.at[:f, :e].set(table)

    grid = (np_ // block_n, tp // block_t)
    return pl.pallas_call(
        functools.partial(
            _lookup_kernel, tb=block_t, k_pad=k_pad, k_real=k_real,
            e_pad=e_pad, f_pad=f_pad, null_rows=null_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((tp, k_pad, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((f_pad, e_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_n), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, block_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, k_pad, block_n), lambda i, j: (j, 0, i),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(table_p, src_t, concepts_t)


def _counts_kernel(
    gamma_ref,     # [TB, K, BN] f32 (0 at padded states/lanes/times)
    src_ref,       # [TB, BN] int32
    conc_ref,      # [K, BN] int32
    counts_ref,    # out [1, F, E] f32 (per-batch-block partial sums)
    acc,           # scratch [F, E] f32
    *,
    tb: int,
    k_pad: int,
    e_pad: int,
    f_pad: int,
    n_tchunks: int,
    null_rows: tuple[bool, ...] | None,
):
    j = pl.program_id(1)
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (f_pad, 1), 0)
    iota_e = jax.lax.broadcasted_iota(jnp.int32, (e_pad, 1), 0)
    bn = gamma_ref.shape[2]

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    for tt in range(tb):
        # ge[e, n] = sum_k gamma[tt, k, n] * 1[concepts[k, n] = e]
        ge = jnp.zeros((e_pad, bn), jnp.float32)
        null_sum = None
        for k in range(k_pad):
            if null_rows is not None and null_rows[k]:
                # NULL state: all mass goes to concept 0 — plain [BN] add
                g = gamma_ref[tt, k]
                null_sum = g if null_sum is None else null_sum + g
            else:
                mask = (iota_e == conc_ref[k][None, :]).astype(jnp.float32)
                ge = ge + mask * gamma_ref[tt, k][None, :]
        if null_sum is not None:
            ge = ge + jnp.where(iota_e == 0, null_sum[None, :], 0.0)
        oh_src = (iota_f == src_ref[tt][None, :]).astype(jnp.float32)
        # acc[f, e] += sum_n oh_src[f, n] * ge[e, n]   (MXU over lanes)
        acc[:] = acc[:] + jax.lax.dot_general(
            oh_src, ge, (((1,), (1,)), ((), ())),
            precision=_HI, preferred_element_type=jnp.float32,
        )

    @pl.when(j == n_tchunks - 1)
    def _():
        counts_ref[0] = acc[:]


@functools.partial(
    jax.jit, static_argnames=("n_rows", "n_cols", "block_n", "block_t",
                              "null_rows", "interpret")
)
def pair_counts_pallas(
    gamma_t: jax.Array,     # [Tp, Kp, Np] f32, 0 at all padding
    src_t: jax.Array,       # [Tp, Np] int32
    concepts_t: jax.Array,  # [Kp, Np] int32
    n_rows: int,
    n_cols: int,
    block_n: int = 1024,
    block_t: int = 8,
    null_rows: tuple[bool, ...] | None = None,
    interpret: bool = False,
) -> jax.Array:
    """counts[f, e] = sum_{t,k,n} gamma_t[t,k,n] 1[src=f] 1[concepts=e].

    Returns [n_rows, n_cols].  gamma_t must be exactly 0 wherever (t, k, n)
    is padding or outside the utterance (the E-step kernels' contract), so
    no masking happens here.  null_rows: static per-k flags for rows whose
    concept id is 0 on every lane (paired-NULL states) — their mass is
    accumulated with one plain add instead of an [E, BN] masked add.
    """
    tp, k_pad, np_ = gamma_t.shape
    assert tp % block_t == 0 and np_ % block_n == 0, (tp, np_)
    assert block_t % 8 == 0 or block_t == tp, block_t
    f_pad, e_pad = _round_up(n_rows, 8), _round_up(n_cols, 8)

    grid = (np_ // block_n, tp // block_t)
    counts = pl.pallas_call(
        functools.partial(
            _counts_kernel, tb=block_t, k_pad=k_pad, e_pad=e_pad,
            f_pad=f_pad, n_tchunks=grid[1], null_rows=null_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0], f_pad, e_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_t, k_pad, block_n), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_n), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, block_n), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f_pad, e_pad), lambda i, j: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((f_pad, e_pad), jnp.float32)],
        interpret=interpret,
    )(gamma_t, src_t, concepts_t)
    return jnp.sum(counts, axis=0)[:n_rows, :n_cols]


def pad_time_major(
    x: jax.Array, tp: int, np_: int, fill=0
) -> jax.Array:
    """[N, T] -> padded time-major [Tp, Np] (helper for the kernel inputs)."""
    n, t = x.shape
    out = jnp.full((tp, np_), fill, x.dtype)
    return out.at[:t, :n].set(x.T)
