"""Sequence (time-axis) parallel HMM forward over a device mesh.

SURVEY.md §5.7: for very long utterances (config #5 stretch — HuBERT frames at
pod scale) the natural TPU design chunks the time axis across devices and
carries the forward state between chunks.  Because the forward recursion is a
log-semiring matrix product (see hmm_core.forward_associative), each device
can compose its chunk's product locally and one ``all_gather`` of the [S, S]
chunk summaries closes the chain — the blockwise analogue of ring attention,
with O(D * S^2) bytes on the ICI instead of re-streaming activations.

  per device d:  P_d = M_{t in chunk d} composed locally   (one scan)
                 alpha_in(d) = alpha_0 (x) P_0 (x) ... (x) P_{d-1}
                               (prefix over the gathered chunk products)
                 local alphas from alpha_in(d)             (one scan)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF, log_matmul, masked_logsumexp
from multimodalworddiscovery_tpu.models import hmm_core

SEQ_AXIS = "seq"


def forward_time_sharded(
    log_init: jax.Array,   # [N, S] (replicated)
    log_trans: jax.Array,  # [N, S, S] (replicated)
    log_emit: jax.Array,   # [N, Ts, S]; Ts must divide the mesh axis size
    src_len: jax.Array,    # [N] (replicated)
    mesh: Mesh,
    axis_name: str = SEQ_AXIS,
) -> tuple[jax.Array, jax.Array]:
    """Returns (alphas [Ts, N, S], logZ [N]), Ts sharded over ``axis_name``.

    Matches ``hmm_core.forward`` exactly (same freeze-past-length masking).
    """
    n, ts, s = log_emit.shape
    d = mesh.shape[axis_name]
    assert ts % d == 0, f"Ts={ts} must divide over {d} devices (pad upstream)"

    # Build the step matrices globally (cheap, and they shard over time).
    m_all = hmm_core.step_matrices(log_trans, log_emit, src_len)  # [Ts-1, N, S, S]
    # pad to Ts so every chunk holds Ts/d matrices; M for t=0 is the identity
    eye = jnp.where(jnp.eye(s, dtype=bool), 0.0, NEG_INF)
    m_all = jnp.concatenate(
        [jnp.broadcast_to(eye, (1, n, s, s)), m_all], axis=0
    )  # [Ts, N, S, S]; entry t composes alpha_{t-1} -> alpha_t (t=0: identity)

    alpha0 = log_init + log_emit[:, 0]  # [N, S]

    def per_device(m_chunk, alpha0_, lens_):
        # m_chunk [Ts/d, N, S, S] local time chunk
        idx = jax.lax.axis_index(axis_name)

        def compose(carry, m_t):
            return log_matmul(carry, m_t), None

        ident = jnp.broadcast_to(eye, (n, s, s))
        p_local, _ = jax.lax.scan(compose, ident, m_chunk)  # [N, S, S]

        # gather every chunk product, compose the exclusive prefix for me
        p_all = jax.lax.all_gather(p_local, axis_name)  # [D, N, S, S]

        def prefix_step(carry, i):
            take = i < idx
            nxt = jnp.where(take, log_matmul(carry, p_all[i]), carry)
            return nxt, None

        prefix, _ = jax.lax.scan(prefix_step, ident, jnp.arange(d))
        alpha_in = masked_logsumexp(
            alpha0_[:, :, None] + prefix, axis=1
        )  # [N, S] alpha after all chunks before mine

        def local_step(alpha, m_t):
            nxt = masked_logsumexp(alpha[:, :, None] + m_t, axis=1)
            return nxt, nxt

        _, alphas_local = jax.lax.scan(local_step, alpha_in, m_chunk)
        return alphas_local  # [Ts/d, N, S]

    spec_m = P(axis_name, None, None, None)
    fn = shard_map(
        per_device,
        mesh,
        in_specs=(spec_m, P(), P()),
        out_specs=P(axis_name, None, None),
        check_rep=False,
    )
    alphas = fn(m_all, alpha0, src_len)  # [Ts, N, S]
    logz = masked_logsumexp(alphas[-1], axis=-1)
    logz = jnp.where(src_len > 0, logz, 0.0)
    return alphas, logz
