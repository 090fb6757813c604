"""Expected-count accumulation as MXU matmuls.

The EM M-steps need  counts[f, e] = sum_{n,t,k} gamma[n,t,k] *
1[row_ids[n,t]=f] * 1[col_ids[n,k]=e].  A segment_sum scatter over flattened
pair ids does this in O(N*T*K) scalar scatters — measured 28 ms on TPU for
the bench corpus, half the EM step.  The same contraction as two one-hot
einsums runs on the MXU in 1.6 ms:

  r[n,t,e]  = gamma[n,t,:] @ onehot(col_ids[n,:], E)      (batched matmul)
  counts    = onehot(row_ids, F)^T . r                     (one big matmul)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this K (columns selected per utterance), the batched [T,K]x[K,E]
# one-hot matmuls are replaced by an unrolled sum of K lane-broadcast masks:
# XLA fuses the K masked adds into one pass over the output, skipping both
# the [N,K,E] one-hot materialization and the tiny-per-batch MXU dispatches
# (measured on TPU v5e at N=8000,T=31,K=12,E=61: pair_counts 1.14 -> 0.70
# ms, table_lookup 0.73 -> 0.64 ms).  Large K keeps the matmul form: the
# unrolled loop's compile time and VPU work grow linearly in K.
_BCAST_K = 32


def table_lookup(
    table: jax.Array,    # [F, E]
    row_ids: jax.Array,  # [N, T]
    col_ids: jax.Array,  # [N, K]
) -> jax.Array:
    """out[n,t,k] = table[row_ids[n,t], col_ids[n,k]] via MXU matmuls.

    The double-gather formulation of this lookup is THE hot spot of the EM
    step on TPU (profiled at 23 of 26 ms/iteration: 3M scalar gathers from a
    49x61 table).  As one-hot matmuls it is two MXU contractions (~1 ms).
    """
    # HIGHEST: each output is a single-term one-hot sum, so full precision
    # reproduces the table value EXACTLY (gather-equivalent bits); default
    # bf16 rounding would perturb log-probs by ~0.4%.
    hi = jax.lax.Precision.HIGHEST
    f, e = table.shape
    rows = jnp.einsum(
        "ntf,fe->nte", jax.nn.one_hot(row_ids, f, dtype=table.dtype), table,
        precision=hi,
    )  # [N, T, E]
    return select_columns(rows, col_ids)


def select_columns(values: jax.Array, col_ids: jax.Array) -> jax.Array:
    """out[n,t,k] = values[n,t,col_ids[n,k]] — per-utterance column select.

    values: [N, T, E]; col_ids: [N, K].  Replaces take_along_axis gathers.
    Exact either way: every output is a single-term one-hot sum.
    """
    e = values.shape[-1]
    k = col_ids.shape[-1]
    if k <= _BCAST_K:
        # K masked reductions sharing one pass over `values` (XLA fuses)
        outs = [
            jnp.sum(
                values
                * jax.nn.one_hot(col_ids[:, j], e, dtype=values.dtype)[:, None, :],
                axis=-1,
            )
            for j in range(k)
        ]
        return jnp.stack(outs, axis=-1)
    return jnp.einsum(
        "nte,nke->ntk", values, jax.nn.one_hot(col_ids, e, dtype=values.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )


def pair_counts(
    gamma: jax.Array,    # [N, T, K] posteriors
    row_ids: jax.Array,  # [N, T] int (e.g. phone ids); invalid rows must have
                         #   gamma == 0 (padding is already zeroed upstream)
    col_ids: jax.Array,  # [N, K] int (e.g. concept ids per target slot/state)
    n_rows: int,
    n_cols: int,
) -> jax.Array:
    """counts [n_rows, n_cols] via MXU one-hot contractions (no scatters)."""
    # HIGHEST: expected counts feed jnp.log in every m_step; default bf16 MXU
    # rounding perturbs gamma sums ~0.4% relative, which the CPU-only parity
    # tests cannot catch (repo rule: matmuls feeding log pipelines use HIGHEST).
    hi = jax.lax.Precision.HIGHEST
    n, t, k = gamma.shape
    if k <= _BCAST_K:
        # ge[n,t,e] = sum_k gamma[n,t,k] * 1[col_ids[n,k]=e], as K fused
        # lane-broadcast masked adds (no [N,K,E] one-hot, no [N,T,E] HBM
        # round-trip: XLA fuses ge into the final matmul's operand read)
        ge = jnp.zeros((n, t, n_cols), gamma.dtype)
        for j in range(k):
            oh = jax.nn.one_hot(col_ids[:, j], n_cols, dtype=gamma.dtype)
            ge = ge + gamma[:, :, j, None] * oh[:, None, :]
    else:
        oh_col = jax.nn.one_hot(col_ids, n_cols, dtype=gamma.dtype)  # [N,K,E]
        ge = jnp.einsum("ntk,nke->nte", gamma, oh_col, precision=hi)
    oh_row = jax.nn.one_hot(row_ids, n_rows, dtype=gamma.dtype)  # [N, T, F]
    return jnp.einsum("ntf,nte->fe", oh_row, ge, precision=hi)
