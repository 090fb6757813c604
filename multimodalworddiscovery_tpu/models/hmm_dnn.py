"""DNN-HMM hybrid aligner (the 2020 paper's DNN-HMM-DNN variant).

Reference counterpart: SURVEY.md §2 C7 — the same Vogel HMM alignment
skeleton, but acoustic emissions come from a neural network instead of a
Gaussian: a frame-level MLP predicts concept posteriors, converted to scaled
likelihoods  log p(x|c) ∝ log p(c|x) - log p(c)  (the classic hybrid trick).

Training is generalized EM, all on device:
  E-step  batched forward-backward -> frame-level concept posteriors r
  M-step  (a) a few Adam steps minimizing CE(r, MLP(x)) under lax.scan,
          (b) concept priors re-estimated from r,
          (c) jump-width transition counts exactly as in the other HMMs.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm_core


class EmissionMLP(nn.Module):
    n_concepts: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):  # [..., D] -> [..., C] logits
        h = nn.relu(nn.Dense(self.hidden)(x))
        h = nn.relu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.n_concepts)(h)


@struct.dataclass
class DnnHMMParams:
    mlp: Any  # flax params
    opt_state: Any
    log_prior: jax.Array  # [V_trg]
    log_jump: jax.Array
    log_p0: jax.Array
    max_jump: int = struct.field(pytree_node=False, default=3)
    hidden: int = struct.field(pytree_node=False, default=256)
    learning_rate: float = struct.field(pytree_node=False, default=1e-3)
    n_sgd: int = struct.field(pytree_node=False, default=4)


def _module(corpus: Corpus, hidden: int) -> EmissionMLP:
    return EmissionMLP(n_concepts=corpus.trg_vocab, hidden=hidden)


def _optimizer(lr: float):
    return optax.adam(lr)


def init(
    corpus: Corpus,
    max_jump: int = 3,
    hidden: int = 256,
    learning_rate: float = 1e-3,
    n_sgd: int = 4,
    key: jax.Array | None = None,
) -> DnnHMMParams:
    if key is None:
        key = jax.random.PRNGKey(0)
    mod = _module(corpus, hidden)
    mlp = mod.init(key, corpus.src[:1, :1])
    w = 2 * max_jump + 1
    return DnnHMMParams(
        mlp=mlp,
        opt_state=_optimizer(learning_rate).init(mlp),
        log_prior=jnp.full((corpus.trg_vocab,), -jnp.log(corpus.trg_vocab)),
        log_jump=(-0.5 * jnp.abs(jnp.arange(w, dtype=jnp.float32) - max_jump - 1)),
        log_p0=jnp.asarray(jnp.log(0.2), jnp.float32),
        max_jump=max_jump,
        hidden=hidden,
        learning_rate=learning_rate,
        n_sgd=n_sgd,
    )


def _concept_loglik(params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, C] scaled log-likelihoods log p(c|x) - log p(c)."""
    mod = _module(corpus, params.hidden)
    logits = mod.apply(params.mlp, corpus.src)
    logpost = jax.nn.log_softmax(logits, axis=-1)
    return logpost - params.log_prior[None, None, :]


def _machinery(params: DnnHMMParams, corpus: Corpus):
    log_trans = hmm_core.build_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    from multimodalworddiscovery_tpu.core.counts import select_columns

    logb = _concept_loglik(params, corpus)
    concepts = hmm_core.state_concepts(corpus)
    log_emit = select_columns(logb, concepts)
    return log_init, log_trans, log_emit


def loglik(params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def em_step(params: DnnHMMParams, corpus: Corpus, smoothing: float = 1e-6):
    v_trg = corpus.trg_vocab
    n, ts = corpus.src.shape[:2]
    tt_max = corpus.max_trg_len

    log_init, log_trans, log_emit = _machinery(params, corpus)
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)

    smask = hmm_core.state_mask(corpus)
    tmask = corpus.src_mask()
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    gamma = jnp.exp(alphas + betas - logz_safe[None, :, None])
    valid = tmask.T[:, :, None] & smask[None, :, :]
    gamma = jnp.moveaxis(jnp.where(valid, gamma, 0.0), 0, 1)  # [N, Ts, S]

    concepts = hmm_core.state_concepts(corpus)
    onehot = jax.nn.one_hot(concepts, v_trg, dtype=gamma.dtype)  # [N, S, C]
    r = jnp.einsum("nts,nsc->ntc", gamma, onehot)  # frame concept posteriors

    # --- neural M-step: a few Adam steps of CE(r, mlp(x)) ---
    mod = _module(corpus, params.hidden)
    opt = _optimizer(params.learning_rate)
    w = tmask.astype(r.dtype)[..., None]

    def ce_loss(mlp):
        logits = mod.apply(mlp, corpus.src)
        logq = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.sum(r * logq * w) / jnp.maximum(jnp.sum(w), 1.0)

    def sgd(carry, _):
        mlp, opt_state = carry
        loss, grads = jax.value_and_grad(ce_loss)(mlp)
        updates, opt_state = opt.update(grads, opt_state)
        mlp = optax.apply_updates(mlp, updates)
        return (mlp, opt_state), loss

    (new_mlp, new_opt), ce = jax.lax.scan(
        sgd, (params.mlp, params.opt_state), None, length=params.n_sgd
    )

    # --- priors from posteriors ---
    prior_counts = jnp.sum(r * w, axis=(0, 1)) + smoothing
    new_log_prior = jnp.log(prior_counts) - jnp.log(jnp.sum(prior_counts))

    # --- transitions (same as other HMMs) ---
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
    width_counts = jax.ops.segment_sum(
        xi_pooled.reshape(-1), width_ids.reshape(-1), num_segments=w_total
    )
    W = 2 * params.max_jump + 1

    new_params = DnnHMMParams(
        mlp=new_mlp,
        opt_state=new_opt,
        log_prior=new_log_prior,
        log_jump=jnp.log(width_counts[:W] + smoothing),
        log_p0=jnp.log(width_counts[W] + smoothing),
        max_jump=params.max_jump,
        hidden=params.hidden,
        learning_rate=params.learning_rate,
        n_sgd=params.n_sgd,
    )
    return new_params, {"loglik": jnp.sum(logz), "ce": ce[-1]}


def align(params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    path = hmm_core.viterbi(log_init, log_trans, log_emit, corpus.src_len)
    return hmm_core.path_to_alignment(path, corpus)


def posteriors(params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    gamma = jnp.exp(alphas + betas - logz_safe[None, :, None])
    valid = corpus.src_mask().T[:, :, None] & hmm_core.state_mask(corpus)[None, :, :]
    return jnp.moveaxis(jnp.where(valid, gamma, 0.0), 0, 1)


def train(params: DnnHMMParams, corpus: Corpus, num_iterations: int):
    def body(p, _):
        p2, stats = em_step(p, corpus)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
