"""Gaussian-emission HMM aligner: continuous acoustic frames.

Reference counterpart: the Gaussian HMM variant of the 2020 DNN-HMM-DNN paper
(SURVEY.md §2 C7) — same Vogel alignment skeleton as the discrete HMM but
emissions are diagonal Gaussians per concept over MFCC-style frames.

TPU-first emission computation: the per-(frame, concept) log-density

  log N(x | mu_c, diag(var_c)) = -0.5 * [ sum_d (x_d - mu_cd)^2 / var_cd
                                          + sum_d log var_cd + D log 2pi ]

expands to  x^2 @ (0.5/var).T  -  x @ (mu/var).T  +  const_c , i.e. two MXU
matmuls over the whole corpus [N*Ts, D] x [D, C] instead of the reference's
per-frame SciPy calls.  M-step sufficient statistics are the same two matmuls
transposed (gamma-weighted sums of x and x^2 per concept).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm_core

_LOG_2PI = 1.8378770664093453


@struct.dataclass
class GaussianHMMParams:
    """Diagonal-Gaussian emissions per concept + Vogel transitions."""

    means: jax.Array  # [V_trg, D]
    log_vars: jax.Array  # [V_trg, D]
    log_jump: jax.Array  # [2*max_jump+1]
    log_p0: jax.Array  # scalar
    max_jump: int = struct.field(pytree_node=False, default=3)


def init(
    corpus: Corpus,
    max_jump: int = 3,
    key: jax.Array | None = None,
    dtype=jnp.float32,
) -> GaussianHMMParams:
    """Means = corpus mean + small per-concept jitter, vars = corpus var."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x = corpus.src  # [N, Ts, D]
    d = x.shape[-1]
    v_trg = corpus.trg_vocab
    mask = corpus.src_mask()[..., None]
    total = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(jnp.where(mask, x, 0.0), axis=(0, 1)) / total
    var = jnp.sum(jnp.where(mask, (x - mean) ** 2, 0.0), axis=(0, 1)) / total
    jitter = 0.1 * jnp.sqrt(var) * jax.random.normal(key, (v_trg, d), dtype)
    w = 2 * max_jump + 1
    return GaussianHMMParams(
        means=(mean[None, :] + jitter).astype(dtype),
        log_vars=jnp.broadcast_to(jnp.log(var + 1e-6), (v_trg, d)).astype(dtype),
        log_jump=(-0.5 * jnp.abs(jnp.arange(w, dtype=dtype) - max_jump - 1)),
        log_p0=jnp.asarray(jnp.log(0.2), dtype=dtype),
        max_jump=max_jump,
    )


def _concept_logdensity(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, V_trg] log N(x_t | concept c) via two MXU matmuls."""
    x = corpus.src  # [N, Ts, D]
    inv_var = jnp.exp(-params.log_vars)  # [C, D]
    const = -0.5 * (
        jnp.sum(params.log_vars, axis=-1)
        + jnp.sum(params.means**2 * inv_var, axis=-1)
        + params.means.shape[-1] * _LOG_2PI
    )  # [C]
    a = jnp.einsum("ntd,cd->ntc", x, params.means * inv_var)
    b = jnp.einsum("ntd,cd->ntc", x**2, 0.5 * inv_var)
    return a - b + const[None, None, :]


def _log_emissions(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, S] state emission log-probs (gather by state concept id)."""
    logb = _concept_logdensity(params, corpus)  # [N, Ts, C]
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    return jnp.take_along_axis(logb, concepts[:, None, :], axis=2)


def _machinery(params: GaussianHMMParams, corpus: Corpus):
    log_trans = hmm_core.build_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    return log_init, log_trans, _log_emissions(params, corpus)


def loglik(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def em_step(
    params: GaussianHMMParams,
    corpus: Corpus,
    smoothing: float = 1e-6,
    var_floor: float = 1e-4,
) -> tuple[GaussianHMMParams, dict[str, jax.Array]]:
    v_trg = params.means.shape[0]
    n, ts = corpus.src.shape[:2]
    tt_max = corpus.max_trg_len

    log_init, log_trans, log_emit = _machinery(params, corpus)
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)

    smask = hmm_core.state_mask(corpus)
    tmask = corpus.src_mask()
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    log_gamma = alphas + betas - logz_safe[None, :, None]
    valid = tmask.T[:, :, None] & smask[None, :, :]
    gamma = jnp.where(valid, jnp.exp(log_gamma), 0.0)  # [Ts, N, S]
    gamma = jnp.moveaxis(gamma, 0, 1)  # [N, Ts, S]

    # Pool state posteriors onto concept ids: r [N, Ts, C]
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    onehot = jax.nn.one_hot(concepts, v_trg, dtype=gamma.dtype)  # [N, S, C]
    r = jnp.einsum("nts,nsc->ntc", gamma, onehot)

    # Gaussian sufficient statistics (MXU matmuls over the whole corpus)
    x = corpus.src
    c0 = jnp.sum(r, axis=(0, 1)) + smoothing  # [C]
    c1 = jnp.einsum("ntc,ntd->cd", r, x)  # [C, D]
    c2 = jnp.einsum("ntc,ntd->cd", r, x**2)  # [C, D]
    new_means = c1 / c0[:, None]
    new_vars = jnp.maximum(c2 / c0[:, None] - new_means**2, var_floor)

    # Transition jump counts (same pattern as the discrete HMM)
    width_ids = hmm_core.jump_width_ids(tt_max, params.max_jump)
    w_total = 2 * params.max_jump + 3

    def xi_step(acc, inputs):
        t, alpha_t, beta_next, emit_next = inputs
        logxi = (
            alpha_t[:, :, None]
            + log_trans
            + (emit_next + beta_next)[:, None, :]
            - logz_safe[:, None, None]
        )
        alive = ((t + 1) < corpus.src_len)[:, None, None]
        xi = jnp.where(alive, jnp.exp(jnp.minimum(logxi, 0.0)), 0.0)
        return acc + jnp.sum(xi, axis=0), None

    emits = jnp.moveaxis(log_emit, 1, 0)
    s = log_emit.shape[2]
    xi_pooled, _ = jax.lax.scan(
        xi_step,
        jnp.zeros((s, s), log_emit.dtype),
        (jnp.arange(ts - 1), alphas[:-1], betas[1:], emits[1:]),
    )
    # project onto jump widths once, not per scan step
    width_counts = jax.ops.segment_sum(
        xi_pooled.reshape(-1), width_ids.reshape(-1), num_segments=w_total
    )
    W = 2 * params.max_jump + 1

    new_params = GaussianHMMParams(
        means=new_means.astype(params.means.dtype),
        log_vars=jnp.log(new_vars).astype(params.log_vars.dtype),
        log_jump=jnp.log(width_counts[:W] + smoothing).astype(params.log_jump.dtype),
        log_p0=jnp.log(width_counts[W] + smoothing).astype(params.log_p0.dtype),
        max_jump=params.max_jump,
    )
    return new_params, {"loglik": jnp.sum(logz)}


def align(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    path = hmm_core.viterbi(log_init, log_trans, log_emit, corpus.src_len)
    return hmm_core.path_to_alignment(path, corpus)


def train(
    params: GaussianHMMParams, corpus: Corpus, num_iterations: int
) -> tuple[GaussianHMMParams, jax.Array]:
    def body(p, _):
        p2, stats = em_step(p, corpus)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
