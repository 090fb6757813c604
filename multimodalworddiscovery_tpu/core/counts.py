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


def pair_counts(
    gamma: jax.Array,    # [N, T, K] posteriors
    row_ids: jax.Array,  # [N, T] int (e.g. phone ids); invalid rows must have
                         #   gamma == 0 (padding is already zeroed upstream)
    col_ids: jax.Array,  # [N, K] int (e.g. concept ids per target slot/state)
    n_rows: int,
    n_cols: int,
) -> jax.Array:
    """counts [n_rows, n_cols] via MXU one-hot contractions (no scatters)."""
    oh_col = jax.nn.one_hot(col_ids, n_cols, dtype=gamma.dtype)  # [N, K, E]
    r = jnp.einsum("ntk,nke->nte", gamma, oh_col)
    oh_row = jax.nn.one_hot(row_ids, n_rows, dtype=gamma.dtype)  # [N, T, F]
    return jnp.einsum("ntf,nte->fe", oh_row, r)
