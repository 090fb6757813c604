"""End-to-end differentiable HMM aligner (CRF-style marginal-likelihood
training of the neural emission scorer).

ROADMAP item 7: the generalized-EM DNN-HMM (models/hmm_dnn.py) trains its
emission MLP against FROZEN per-iteration posterior targets.  Here the MLP
instead receives exact gradients THROUGH the aligner's marginal
log-likelihood: d logZ / d log_emit[n,t,s] = gamma[n,t,s] (the state
posterior) — which the fused E-step already computes.  A ``jax.custom_vjp``
makes the backward pass literally one more read of the forward-backward
outputs, so end-to-end training costs the same per step as inference and can
use the Pallas kernel in both directions.

Transitions are treated as constants inside the gradient (their cotangents
are zero) and re-estimated by the usual closed-form M-step from expected
counts — the hybrid "gradient E, closed-form M" scheme.

The scaled-likelihood prior is SELF-CONSISTENT and differentiable: emission
potentials are ``log p(c|x) - log E_frames[p(c|x)]`` with the expectation
taken over the batch under the CURRENT MLP.  With a FIXED prior the MLP
games the objective by dumping posterior mass on small-prior concepts
(measured: marginal climbs 5k -> 33k while alignment accuracy collapses
0.92 -> 0.38); making the prior the MLP's own mean posterior closes that
loophole — and the resulting end-to-end path BEATS generalized EM on the
synthetic frames corpus (0.965 vs 0.917 positional accuracy, same budget).

Parameter pytree and decode paths are shared with models/hmm_dnn.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm_core, hmm_dnn

# re-exported so the registry/model surface matches the other aligners
DnnHMMParams = hmm_dnn.DnnHMMParams
init = hmm_dnn.init
align = hmm_dnn.align
posteriors = hmm_dnn.posteriors
loglik = hmm_dnn.loglik
_machinery = hmm_dnn._machinery  # retrieval re-pairing path


def _zero_cotangent(x):
    if jnp.issubdtype(jnp.result_type(x), jnp.floating):
        return jnp.zeros_like(x)
    import numpy as np

    return np.zeros(jnp.shape(x), jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def logmarginal(
    max_jump: int,
    use_pallas: bool,
    dot_dtype: str,
    log_jump: jax.Array,
    log_p0: jax.Array,
    log_emit: jax.Array,  # [N, Ts, S]
    corpus: Corpus,
) -> jax.Array:
    """Σ_n log p(x_n) under the Vogel HMM — differentiable in ``log_emit``
    (gradient = state posteriors; transitions get zero cotangents and are
    re-estimated by the M-step)."""
    log_init = hmm_core.build_log_init(log_p0, corpus)
    log_trans = hmm_core.build_log_trans(log_jump, log_p0, corpus, max_jump)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def _logmarginal_fwd(max_jump, use_pallas, dot_dtype, log_jump, log_p0, log_emit, corpus):
    gamma, _width, logz = hmm_core.estep(
        log_jump, log_p0, max_jump, log_emit, corpus,
        use_pallas=use_pallas, dot_dtype=dot_dtype,
    )
    return jnp.sum(logz), (gamma, log_jump, log_p0, corpus)


def _logmarginal_bwd(max_jump, use_pallas, dot_dtype, res, ct):
    gamma, log_jump, log_p0, corpus = res
    d_corpus = jax.tree.map(_zero_cotangent, corpus)
    return (
        jnp.zeros_like(log_jump),
        jnp.zeros_like(log_p0),
        ct * gamma,
        d_corpus,
    )


logmarginal.defvjp(_logmarginal_fwd, _logmarginal_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def logmarginal_e2e(
    max_jump: int,
    use_pallas: bool,
    dot_dtype: str,
    log_jump: jax.Array,
    log_p0: jax.Array,
    log_emit: jax.Array,  # [N, Ts, S]
    corpus: Corpus,
) -> jax.Array:
    """Σ_n log p(x_n), differentiable in ``log_emit`` AND the transition
    parameters (``log_jump``, ``log_p0``) — fully end-to-end.

    The transition gradient is the classic CRF moment difference, computed
    from quantities the fused E-step already produces:

        d logZ / d table[w] = E_posterior[#jumps of width w]        (= xi
                              projected onto widths, pooled over n, t)
                            - Σ_{n,s} occ_out[n,s] · p_n(w | s)     (model
                              expectation under the CURRENT softmax rows)

    where occ_out[n,s] = Σ_{t+1<len} gamma[n,t,s] is the expected number of
    transitions out of s, and p_n(w|s) = Σ_{s': ids=w} exp(trans[n,s,s']).
    The second term never materializes [N,S,S]: with the factored form
    exp(trans) = exp(base)·exp(-rowz)·valid it is one [S,N]x[N,S] matmul
    masked onto width ids.  log_p0 additionally receives the initial-
    distribution moment (E[null at t=0] - p_init(null)).
    """
    log_init = hmm_core.build_log_init(log_p0, corpus)
    log_trans = hmm_core.build_log_trans(log_jump, log_p0, corpus, max_jump)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def _e2e_fwd(max_jump, use_pallas, dot_dtype, log_jump, log_p0, log_emit, corpus):
    gamma, width_counts, logz = hmm_core.estep(
        log_jump, log_p0, max_jump, log_emit, corpus,
        use_pallas=use_pallas, dot_dtype=dot_dtype,
    )
    return jnp.sum(logz), (gamma, width_counts, log_jump, log_p0, corpus)


def _e2e_bwd(max_jump, use_pallas, dot_dtype, res, ct):
    from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF

    gamma, width_counts, log_jump, log_p0, corpus = res
    tt = corpus.max_trg_len
    ts = gamma.shape[1]
    w_jump = 2 * max_jump + 1

    base, rowz, colmask = hmm_core.factor_log_trans(
        log_jump, log_p0, corpus, max_jump
    )
    ids = hmm_core.jump_width_ids(tt, max_jump)  # [S, S]

    # model expectation of each width: occ_out weighs each row's softmax
    not_last = (jnp.arange(ts)[None, :] + 1) < corpus.src_len[:, None]
    occ_out = jnp.sum(gamma * not_last[:, :, None].astype(gamma.dtype), axis=1)
    a = occ_out * jnp.exp(jnp.minimum(-rowz, 60.0))  # [N, S]
    valid = (colmask > NEG_INF / 2).astype(a.dtype)  # [N, S']
    m = jnp.exp(base) * jnp.einsum(
        "ns,nt->st", a, valid, precision=jax.lax.Precision.HIGHEST
    )
    e_model = jax.ops.segment_sum(
        m.reshape(-1), ids.reshape(-1), num_segments=w_jump + 2
    )
    d_table = width_counts - e_model  # [W+2]; impossible slot is 0 - 0

    # initial-distribution moment for log_p0
    _, is_null = hmm_core.state_positions(tt)
    null_f = is_null[None, :].astype(gamma.dtype)
    e_null0 = jnp.sum(gamma[:, 0] * null_f)
    log_init = hmm_core.build_log_init(log_p0, corpus)
    nonempty = (corpus.src_len > 0).astype(gamma.dtype)
    p_null0 = jnp.sum(jnp.exp(log_init) * null_f, axis=1)  # [N]
    d_p0_init = e_null0 - jnp.sum(p_null0 * nonempty)

    d_corpus = jax.tree.map(_zero_cotangent, corpus)
    return (
        ct * d_table[:w_jump],
        ct * (d_table[w_jump] + d_p0_init),
        ct * gamma,
        d_corpus,
    )


logmarginal_e2e.defvjp(_e2e_fwd, _e2e_bwd)


def _log_emit_from_mlp(mlp, params: DnnHMMParams, corpus: Corpus) -> jax.Array:
    """Emission potentials with the SELF-CONSISTENT prior: the log-prior is
    the MLP's own masked mean posterior over the batch (differentiable — no
    stop_gradient: the stop-gradient variant measures 0.76 vs 0.97)."""
    from multimodalworddiscovery_tpu.core.counts import select_columns

    mod = hmm_dnn._module(corpus, params.hidden)
    logits = mod.apply(mlp, corpus.src)
    logpost = jax.nn.log_softmax(logits, axis=-1)
    w = corpus.src_mask().astype(logpost.dtype)[..., None]
    prior = jnp.sum(jnp.exp(logpost) * w, axis=(0, 1)) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    logb = logpost - jnp.log(prior + 1e-8)[None, None, :]
    concepts = hmm_core.state_concepts(corpus)
    return select_columns(logb, concepts)


TRANSITION_LR = 2e-2  # see init_e2e


def _optimizer_e2e(lr: float):
    """Adam over the (mlp, log_jump, log_p0) triple with a larger step size
    on the transition parameters.  Adam is gradient-scale invariant, so the
    handful of transition scalars crawl at the MLP's lr (measured: acc 0.874
    after 40 iters vs the closed-form M-step's 0.965 at 10) — they need their
    own rate, not a gradient rescale."""
    import optax

    return optax.multi_transform(
        {"mlp": optax.adam(lr), "trans": optax.adam(TRANSITION_LR)},
        ("mlp", "trans", "trans"),
    )


def init_e2e(corpus: Corpus, **kw) -> DnnHMMParams:
    """Params for the FULLY end-to-end mode (``learn_transitions=True``):
    the Adam state covers (mlp, log_jump, log_p0) instead of the MLP alone."""
    p = hmm_dnn.init(corpus, **kw)
    opt = _optimizer_e2e(p.learning_rate)
    return p.replace(opt_state=opt.init((p.mlp, p.log_jump, p.log_p0)))


def em_step(
    params: DnnHMMParams,
    corpus: Corpus,
    smoothing: float = 1e-6,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
    learn_transitions: bool = False,
):
    """One hybrid iteration: n_sgd Adam steps on -logZ/frames THROUGH the
    aligner (custom-VJP marginal gradient), then the closed-form prior (and,
    unless ``learn_transitions``, transition) M-step from fresh expected
    counts.  Fully jittable.

    learn_transitions=True trains ``log_jump``/``log_p0`` by Adam through
    ``logmarginal_e2e`` (exact CRF moment gradients) instead of the
    closed-form count update — params must come from ``init_e2e`` so the
    optimizer state covers them."""
    del interpret  # the CRF path always runs the compiled/oracle estep
    n_frames = jnp.maximum(jnp.sum(corpus.src_mask()), 1).astype(jnp.float32)
    opt = (
        _optimizer_e2e(params.learning_rate)
        if learn_transitions
        else hmm_dnn._optimizer(params.learning_rate)
    )

    import optax

    if learn_transitions:

        def nll(triple):
            mlp, lj, lp0 = triple
            log_emit = _log_emit_from_mlp(mlp, params, corpus)
            return -logmarginal_e2e(
                params.max_jump, use_pallas, dot_dtype, lj, lp0, log_emit,
                corpus,
            ) / n_frames

        def sgd(carry, _):
            triple, opt_state = carry
            loss, grads = jax.value_and_grad(nll)(triple)
            updates, opt_state = opt.update(grads, opt_state)
            triple = optax.apply_updates(triple, updates)
            return (triple, opt_state), loss

        ((new_mlp, new_lj, new_lp0), new_opt), losses = jax.lax.scan(
            sgd,
            ((params.mlp, params.log_jump, params.log_p0), params.opt_state),
            None,
            length=params.n_sgd,
        )
        params = params.replace(
            mlp=new_mlp, log_jump=new_lj, log_p0=new_lp0, opt_state=new_opt
        )
        # closed-form update for the decode-time prior only
        counts, ll = hmm_dnn.expected_counts(
            params, corpus, use_pallas=use_pallas, dot_dtype=dot_dtype
        )
        prior = counts["prior"] + smoothing
        params = params.replace(
            log_prior=jnp.log(prior) - jnp.log(jnp.sum(prior))
        )
        return params, {"loglik": ll, "nll_per_frame": losses[-1]}

    def nll(mlp):
        log_emit = _log_emit_from_mlp(mlp, params, corpus)
        return -logmarginal(
            params.max_jump, use_pallas, dot_dtype,
            params.log_jump, params.log_p0, log_emit, corpus,
        ) / n_frames

    def sgd(carry, _):
        mlp, opt_state = carry
        loss, grads = jax.value_and_grad(nll)(mlp)
        updates, opt_state = opt.update(grads, opt_state)
        mlp = optax.apply_updates(mlp, updates)
        return (mlp, opt_state), loss

    (new_mlp, new_opt), losses = jax.lax.scan(
        sgd, (params.mlp, params.opt_state), None, length=params.n_sgd
    )
    params = params.replace(mlp=new_mlp, opt_state=new_opt)

    # closed-form M-step for transitions + priors from the updated emissions
    counts, ll = hmm_dnn.expected_counts(
        params, corpus, use_pallas=use_pallas, dot_dtype=dot_dtype
    )
    params = hmm_dnn.m_step(params, counts, smoothing)
    return params, {"loglik": ll, "nll_per_frame": losses[-1]}


def train(
    params: DnnHMMParams,
    corpus: Corpus,
    num_iterations: int,
    use_pallas: bool = False,
    dot_dtype: str = "float32",
    learn_transitions: bool = False,
):
    def body(p, _):
        p2, stats = em_step(
            p, corpus, use_pallas=use_pallas, dot_dtype=dot_dtype,
            learn_transitions=learn_transitions,
        )
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
