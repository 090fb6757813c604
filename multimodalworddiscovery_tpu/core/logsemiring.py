"""Log-semiring primitives shared by every aligner.

The reference computes HMM forward-backward and Model-1 posteriors with
per-utterance float64 NumPy loops (SURVEY.md §3.1/§3.2). On TPU everything is
batched float32 in log space, so the whole framework leans on a small set of
NaN-safe masked log-space ops defined here. Padding positions carry
``NEG_INF`` and must never poison a reduction with ``inf - inf = nan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large finite negative instead of -inf: keeps XLA fusions NaN-free on TPU
# (exp(NEG_INF) == 0 in f32, and NEG_INF + NEG_INF does not overflow to nan).
NEG_INF = -1e30


def masked_log(p: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """log(p) with zeros (and masked entries) mapped to NEG_INF, never nan."""
    safe = jnp.where(p > 0, p, 1.0)
    out = jnp.where(p > 0, jnp.log(safe), NEG_INF)
    if mask is not None:
        out = jnp.where(mask, out, NEG_INF)
    return out


def masked_logsumexp(
    x: jax.Array,
    mask: jax.Array | None = None,
    axis: int | tuple[int, ...] = -1,
    keepdims: bool = False,
) -> jax.Array:
    """logsumexp along ``axis`` ignoring masked entries; all-masked -> NEG_INF.

    Safe against every entry being NEG_INF (returns NEG_INF, not nan).
    """
    if mask is not None:
        x = jnp.where(mask, x, NEG_INF)
    m = jnp.max(x, axis=axis, keepdims=True)
    # Rows that are entirely NEG_INF: shift by 0 so exp(NEG_INF) == 0 cleanly.
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = jnp.where(m > NEG_INF / 2, jnp.log(s) + m_safe, NEG_INF)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def log_normalize(
    x: jax.Array,
    mask: jax.Array | None = None,
    axis: int | tuple[int, ...] = -1,
) -> jax.Array:
    """Normalize in log space: x - logsumexp(x). Masked entries stay NEG_INF."""
    z = masked_logsumexp(x, mask=mask, axis=axis, keepdims=True)
    z = jnp.where(z > NEG_INF / 2, z, 0.0)  # avoid NEG_INF - NEG_INF
    out = x - z
    if mask is not None:
        out = jnp.where(mask, out, NEG_INF)
    return out


def log_matmul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Log-semiring "matmul": out[..., i, j] = logsumexp_k a[..., i, k] + b[..., k, j].

    The HMM forward/backward recursion inner product (SURVEY.md §3.2 🔥).
    jnp reference implementation; ``ops.log_semiring`` provides the Pallas
    kernel with this as its test oracle.
    """
    # [..., i, k, 1] + [..., 1, k, j] -> logsumexp over k
    x = a[..., :, :, None] + b[..., None, :, :]
    return masked_logsumexp(x, axis=-2)


def max_matmul(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Max-plus semiring product with argmax, for Viterbi.

    Returns (values, argmax_k) with
    values[..., i, j] = max_k a[..., i, k] + b[..., k, j].
    """
    x = a[..., :, :, None] + b[..., None, :, :]
    return jnp.max(x, axis=-2), jnp.argmax(x, axis=-2)
