"""End-to-end differentiable HMM (models/hmm_crf.py): custom-VJP gradient
parity vs autodiff through the forward scan, and CRF training quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import hmm_core, hmm_crf, hmm_dnn


def _setup(n=16, seed=31):
    corpus, gold, _ = make_flickr8k_mini(n_utterances=n, seed=seed)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=seed)
    params = hmm_dnn.init(fc, hidden=32, n_sgd=3, key=jax.random.PRNGKey(0))
    return fc, fg, params


def test_custom_vjp_gradient_matches_autodiff():
    """d logZ / d log_emit from the custom VJP (= gamma from the fused
    E-step) must equal autodiff through the XLA forward scan."""
    fc, _, params = _setup()
    log_emit = hmm_crf._log_emit_from_mlp(params.mlp, params, fc)

    def direct(le):
        log_init = hmm_core.build_log_init(params.log_p0, fc)
        log_trans = hmm_core.build_log_trans(
            params.log_jump, params.log_p0, fc, params.max_jump
        )
        _, logz = hmm_core.forward(log_init, log_trans, le, fc.src_len)
        return jnp.sum(logz)

    g_auto = np.asarray(jax.grad(direct)(log_emit))
    g_vjp = np.asarray(
        jax.grad(
            lambda le: hmm_crf.logmarginal(
                params.max_jump, False, "float32",
                params.log_jump, params.log_p0, le, fc,
            )
        )(log_emit)
    )
    # naive autodiff through the masked log-space scan yields NaN at padded
    # (t, s) entries (the where+NEG_INF gradient trap) — one more reason the
    # custom VJP exists.  Compare where autodiff is finite; the VJP gradient
    # must ALSO be finite (zero) everywhere else.
    finite = np.isfinite(g_auto)
    valid = np.asarray(fc.src_mask())[:, :, None] & np.ones_like(finite)
    assert finite[valid & finite].size > 0
    np.testing.assert_allclose(
        g_vjp[finite], g_auto[finite], rtol=1e-3, atol=1e-5
    )
    assert np.all(np.isfinite(g_vjp))
    assert np.allclose(g_vjp[~valid], 0.0, atol=1e-6)
    # the gradient IS the state posterior: rows sum to 1 on valid frames
    sums = np.asarray(jnp.sum(g_vjp, axis=-1))
    mask = np.asarray(fc.src_mask())
    np.testing.assert_allclose(sums[mask], 1.0, atol=1e-4)
    assert np.allclose(sums[~mask], 0.0, atol=1e-6)


def test_custom_vjp_gradient_pallas_interpret():
    fc, _, params = _setup(n=8, seed=32)
    log_emit = hmm_crf._log_emit_from_mlp(params.mlp, params, fc)

    def f(le, use_pallas):
        return hmm_crf.logmarginal(
            params.max_jump, use_pallas, "float32",
            params.log_jump, params.log_p0, le, fc,
        )

    # interpret-mode Pallas backward == XLA backward
    with jax.disable_jit():
        pass
    g_x = jax.grad(lambda le: f(le, False))(log_emit)
    # interpret path: route estep through the kernel in interpret mode
    gamma, _, _ = hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, log_emit, fc,
        use_pallas=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(g_x), np.asarray(gamma), rtol=1e-3, atol=1e-4
    )


def test_crf_training_improves_marginal_and_aligns():
    """Same setup as test_hmm_dnn's quality test: the end-to-end gradient
    path must reach at least the generalized-EM hybrid's ballpark."""
    corpus, gold, _ = make_flickr8k_mini(n_utterances=80, seed=41)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=12, noise=0.1, seed=41)
    params = hmm_dnn.init(fc, key=jax.random.PRNGKey(1))
    params, lls = jax.jit(lambda p: hmm_crf.train(p, fc, 10))(params)
    lls = np.asarray(lls)
    assert lls[-1] > lls[0], lls

    pred = np.asarray(jax.jit(hmm_crf.align)(params, fc))
    mask = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    acc = (pred == fg.alignment)[mask].mean()
    # measured 0.965 vs the generalized-EM hybrid's 0.917 on this corpus
    assert acc > 0.9, acc


def test_e2e_transition_gradient_matches_finite_differences():
    """logmarginal_e2e's closed-form transition gradients (CRF moment
    difference from gamma/xi) must equal float64 central differences of the
    dense primal.  (Autodiff through the dense masked path is NOT usable as
    the oracle — it NaNs on the NEG_INF guards, the reason the custom VJP
    exists.)"""
    fc, _, params = _setup(n=12, seed=33)
    log_emit = hmm_crf._log_emit_from_mlp(params.mlp, params, fc)

    g_vjp = jax.grad(
        lambda lj, lp0: hmm_crf.logmarginal_e2e(
            params.max_jump, False, "float32", lj, lp0, log_emit, fc
        ),
        argnums=(0, 1),
    )(params.log_jump, params.log_p0)

    with jax.enable_x64(True):
        fc64 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), fc)
        le64 = jnp.asarray(np.asarray(log_emit), jnp.float64)
        lj0 = np.asarray(params.log_jump, np.float64)
        p00 = float(params.log_p0)

        def f(lj, lp0):
            lp0 = jnp.asarray(lp0, jnp.float64)
            li = hmm_core.build_log_init(lp0, fc64)
            lt = hmm_core.build_log_trans(
                jnp.asarray(lj), lp0, fc64, params.max_jump
            )
            _, logz = hmm_core.forward(li, lt, le64, fc64.src_len)
            return float(jnp.sum(logz))

        eps = 1e-5
        fd_jump = []
        for k in range(lj0.size):
            e = np.zeros_like(lj0)
            e[k] = eps
            fd_jump.append((f(lj0 + e, p00) - f(lj0 - e, p00)) / (2 * eps))
        fd_p0 = (f(lj0, p00 + eps) - f(lj0, p00 - eps)) / (2 * eps)

    np.testing.assert_allclose(
        np.asarray(g_vjp[0]), fd_jump, rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(float(g_vjp[1]), fd_p0, rtol=2e-3, atol=2e-3)


@pytest.mark.slow  # training-quality run; e2e transition GRADIENTS are
# finite-difference-pinned above, which is the correctness content
def test_crf_e2e_learn_transitions_trains():
    """Fully end-to-end mode: transitions learned by Adam through the
    marginal (no closed-form transition M-step) still reaches the EM-
    transition CRF's quality ballpark."""
    corpus, gold, _ = make_flickr8k_mini(n_utterances=80, seed=41)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=12, noise=0.1, seed=41)
    params = hmm_crf.init_e2e(fc, key=jax.random.PRNGKey(1))
    params, lls = jax.jit(
        lambda p: hmm_crf.train(p, fc, 20, learn_transitions=True)
    )(params)
    lls = np.asarray(lls)
    assert lls[-1] > lls[0], lls

    pred = np.asarray(jax.jit(hmm_crf.align)(params, fc))
    mask = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    acc = (pred == fg.alignment)[mask].mean()
    # measured 0.953 @ 20 iters, 0.964 @ 30 — matching the closed-form
    # M-step variant's 0.965 (docs/PERFORMANCE.md)
    assert acc > 0.93, acc


def test_crf_minibatch_training():
    """hmm_crf composes with make_minibatch_step (cli: train.batch_size):
    per-batch marginal-gradient steps + per-batch closed-form transition
    M-step still learn the aligner (the scaling path for MSCOCO-sized
    continuous corpora, like attention/grounding).

    The SELF-CONSISTENT prior is a batch statistic, so the batch must carry
    enough frames to estimate it: measured on this corpus B=20 is unstable
    (acc oscillates ~0.5-0.65) while B=40 reaches 0.96 and B=80 matches the
    full-batch 0.97 — size the batch to >=~2k frames in practice."""
    from multimodalworddiscovery_tpu.models.minibatch import make_minibatch_step

    corpus, gold, _ = make_flickr8k_mini(n_utterances=80, seed=41)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=12, noise=0.1, seed=41)
    params = hmm_dnn.init(fc, key=jax.random.PRNGKey(2))
    step = make_minibatch_step(hmm_crf.em_step, fc, batch_size=40)
    key = jax.random.PRNGKey(3)
    for i in range(40):
        params, _stats = step(params, jax.random.fold_in(key, i))

    pred = np.asarray(jax.jit(hmm_crf.align)(params, fc))
    mask = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    acc = (pred == fg.alignment)[mask].mean()
    assert acc > 0.9, acc


def test_crf_cli_registry():
    from multimodalworddiscovery_tpu.models.registry import get_model

    assert get_model("hmm_crf") is hmm_crf
