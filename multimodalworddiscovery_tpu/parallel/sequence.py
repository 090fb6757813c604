"""Sequence (time-axis) parallel HMM forward AND full E-step over a mesh.

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

The backward recursion is the SAME product reversed: beta_{t-1} = M_t (x)
beta_t (matrix-vector from the right), so the exclusive SUFFIX of the same
gathered chunk products closes it — one all_gather serves both directions
(``estep_time_sharded``).  gamma/xi then assemble locally per time chunk:
each device owns alpha_{t-1} (its forward prefix), beta_t (its backward
chunk), and M_t, which is exactly what a transition posterior needs, so the
pooled xi is a local accumulation + one psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodalworddiscovery_tpu.core.logsemiring import (
    NEG_INF,
    log_matmul,
    masked_logsumexp,
)
from multimodalworddiscovery_tpu.models import hmm_core

SEQ_AXIS = "seq"


def _log_eye(s: int, dtype=jnp.float32) -> jax.Array:
    return jnp.where(jnp.eye(s, dtype=bool), 0.0, NEG_INF).astype(dtype)


def _padded_step_matrices(
    log_trans: jax.Array, log_emit: jax.Array, src_len: jax.Array
) -> jax.Array:
    """[Ts, N, S, S] step matrices with the t=0 slot set to the identity, so
    entry t composes alpha_{t-1} -> alpha_t and every chunk holds Ts/D of
    them (identity past src_len — prefix products freeze, suffix products
    stay the zero log-vector)."""
    n, ts, s = log_emit.shape
    m_all = hmm_core.step_matrices(log_trans, log_emit, src_len)  # [Ts-1,N,S,S]
    eye = _log_eye(s, log_emit.dtype)
    return jnp.concatenate(
        [jnp.broadcast_to(eye, (1, n, s, s)), m_all], axis=0
    )


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
    m_all = _padded_step_matrices(log_trans, log_emit, src_len)
    eye = _log_eye(s, log_emit.dtype)
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
    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(spec_m, P(), P()),
        out_specs=P(axis_name, None, None),
        check_vma=False,
    )
    alphas = fn(m_all, alpha0, src_len)  # [Ts, N, S]
    logz = masked_logsumexp(alphas[-1], axis=-1)
    logz = jnp.where(src_len > 0, logz, 0.0)
    return alphas, logz


def estep_time_sharded(
    log_init: jax.Array,   # [N, S] (replicated)
    log_trans: jax.Array,  # [N, S, S] (replicated)
    log_emit: jax.Array,   # [N, Ts, S]; Ts must divide the mesh axis size
    src_len: jax.Array,    # [N] (replicated)
    smask: jax.Array,      # [N, S] state validity (hmm_core.state_mask)
    mesh: Mesh,
    axis_name: str = SEQ_AXIS,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """FULL time-sharded E-step: forward, backward, gamma and pooled xi with
    the time axis sharded over ``axis_name`` (SURVEY.md §5.7 beyond-minimum;
    VERDICT round-2 item 4).

    Returns (gamma [N, Ts, S] — time axis sharded on the mesh, xi_pooled
    [S, S] replicated, logZ [N] replicated), numerically matching
    ``hmm_core.estep``'s XLA path on the same (padded) inputs:

      forward:  alpha_in(d) from the exclusive PREFIX of the gathered chunk
                products (as ``forward_time_sharded``).
      backward: beta_out(d)[s] = logsumexp_{s'} suffix(d)[s, s'] — the
                exclusive SUFFIX of the SAME gathered products applied to the
                all-ones vector (log 0s); identity step matrices past
                src_len keep beta frozen at 0 exactly like
                ``hmm_core.backward``'s masking.
      gamma:    exp(alpha_t + beta_t - logZ) on the local chunk.
      xi:       transition INTO local step t uses alpha_{t-1} (alpha_in for
                the chunk's first step), M_t (= trans + emit_t), beta_t —
                all device-local; alive iff 1 <= t < src_len; one psum pools
                the [S, S] accumulator.

    Per-device work is O((Ts/D) * N * S^3) for the chunk products vs the
    sequential scan's O(Ts * N * S^2) — time sharding pays an S multiplier
    to cut the sequential depth D ways, so it wins when Ts >> S * D (the
    long-utterance regime it exists for).
    """
    n, ts, s = log_emit.shape
    d = mesh.shape[axis_name]
    assert ts % d == 0, f"Ts={ts} must divide over {d} devices (pad upstream)"

    m_all = _padded_step_matrices(log_trans, log_emit, src_len)
    eye = _log_eye(s, log_emit.dtype)
    alpha0 = log_init + log_emit[:, 0]  # [N, S]
    chunk = ts // d

    def per_device(m_chunk, alpha0_, lens_, smask_):
        idx = jax.lax.axis_index(axis_name)
        ident = jnp.broadcast_to(eye, (n, s, s))

        def compose(carry, m_t):
            return log_matmul(carry, m_t), None

        p_local, _ = jax.lax.scan(compose, ident, m_chunk)  # [N, S, S]
        p_all = jax.lax.all_gather(p_local, axis_name)  # [D, N, S, S]

        # exclusive prefix (chunks before mine) and INCLUSIVE total product;
        # exclusive suffix composed right-to-left so factors stay in time
        # order: suffix = P_{idx+1} (x) ... (x) P_{D-1}
        def prefix_step(carry, i):
            return jnp.where(i < idx, log_matmul(carry, p_all[i]), carry), None

        prefix, _ = jax.lax.scan(prefix_step, ident, jnp.arange(d))

        def suffix_step(carry, i):
            return jnp.where(i > idx, log_matmul(p_all[i], carry), carry), None

        suffix, _ = jax.lax.scan(
            suffix_step, ident, jnp.arange(d - 1, -1, -1)
        )

        # total = prefix (x) P_local (x) suffix — 2 log-matmuls instead of a
        # fresh D-step scan over p_all (each is the dominant O(N*S^3) op here)
        total = log_matmul(log_matmul(prefix, p_local), suffix)
        alpha_last = masked_logsumexp(alpha0_[:, :, None] + total, axis=1)
        logz = masked_logsumexp(alpha_last, axis=-1)
        logz = jnp.where(lens_ > 0, logz, 0.0)
        logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)  # [N]

        alpha_in = masked_logsumexp(alpha0_[:, :, None] + prefix, axis=1)
        beta_out = masked_logsumexp(suffix, axis=2)  # [N, S]

        # local forward alphas: alphas[i] = alpha at global t = idx*chunk + i
        def fwd_step(alpha, m_t):
            nxt = masked_logsumexp(alpha[:, :, None] + m_t, axis=1)
            return nxt, nxt

        _, alphas_local = jax.lax.scan(fwd_step, alpha_in, m_chunk)

        # local backward betas: betas[i] = beta at the same global t;
        # beta at the chunk's LAST step is beta_out, earlier steps apply
        # beta_{t-1} = M_t (x) beta_t walking the chunk matrices reversed
        def bwd_step(beta, m_t):
            prv = masked_logsumexp(m_t + beta[:, None, :], axis=2)
            return prv, beta

        _, betas_rev = jax.lax.scan(bwd_step, beta_out, m_chunk[::-1])
        betas_local = betas_rev[::-1]  # [chunk, N, S]

        # gamma on the local chunk (same validity masking as hmm_core.estep)
        t_global = idx * chunk + jnp.arange(chunk)  # [chunk]
        tmask = t_global[:, None] < lens_[None, :]  # [chunk, N]
        log_gamma = alphas_local + betas_local - logz_safe[None, :, None]
        valid = tmask[:, :, None] & smask_[None, :, :]
        gamma = jnp.where(valid, jnp.exp(jnp.minimum(log_gamma, 0.0)), 0.0)

        # pooled xi: transition INTO local step i (alive iff 1 <= t < len);
        # alpha_{t-1} is alpha_in for i=0, else the previous local alpha
        alphas_prev = jnp.concatenate(
            [alpha_in[None], alphas_local[:-1]], axis=0
        )  # [chunk, N, S]

        def xi_step(acc, inp):
            t, a_prev, m_t, b_t = inp
            logxi = (
                a_prev[:, :, None] + m_t + b_t[:, None, :]
                - logz_safe[:, None, None]
            )
            alive = ((t >= 1) & (t < lens_))[:, None, None]
            xi = jnp.where(alive, jnp.exp(jnp.minimum(logxi, 0.0)), 0.0)
            return acc + jnp.sum(xi, axis=0), None

        xi_local, _ = jax.lax.scan(
            xi_step,
            jnp.zeros((s, s), log_emit.dtype),
            (t_global, alphas_prev, m_chunk, betas_local),
        )
        xi_pooled = jax.lax.psum(xi_local, axis_name)
        return gamma, xi_pooled, logz

    fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(axis_name, None, None, None), P(), P(), P()),
        out_specs=(P(axis_name, None, None), P(), P()),
        check_vma=False,
    )
    gamma_tns, xi_pooled, logz = fn(m_all, alpha0, src_len, smask)
    return jnp.moveaxis(gamma_tns, 0, 1), xi_pooled, logz
