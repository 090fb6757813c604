import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import multivariate_normal

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import hmm_gaussian


@pytest.fixture(scope="module")
def frames():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=100, seed=7)
    fc, fg, means = phones_to_frames(corpus, gold, feat_dim=8, seed=7)
    return fc, fg


def test_concept_logdensity_matches_scipy(frames):
    fc, _ = frames
    params = hmm_gaussian.init(fc, key=jax.random.PRNGKey(1))
    logb = np.asarray(hmm_gaussian._concept_logdensity(params, fc))
    x = np.asarray(fc.src)
    mu = np.asarray(params.means, dtype=np.float64)
    var = np.exp(np.asarray(params.log_vars, dtype=np.float64))
    for n in (0, 3):
        for t in (0, 2):
            for c in (0, 5, fc.trg_vocab - 1):
                want = multivariate_normal.logpdf(x[n, t], mu[c], np.diag(var[c]))
                np.testing.assert_allclose(logb[n, t, c], want, rtol=2e-3, atol=2e-3)


def test_em_monotone_loglik(frames):
    fc, _ = frames
    params = hmm_gaussian.init(fc, key=jax.random.PRNGKey(0))
    _, lls = jax.jit(lambda p: hmm_gaussian.train(p, fc, 6))(params)
    lls = np.asarray(lls)
    # EM with variance flooring is near-monotone; allow tiny dips
    assert np.all(np.diff(lls) > -np.abs(lls[0]) * 1e-4), lls


def test_recovers_frame_alignment(frames):
    fc, fg = frames
    params = hmm_gaussian.init(fc, key=jax.random.PRNGKey(0))
    params, _ = jax.jit(lambda p: hmm_gaussian.train(p, fc, 12))(params)
    pred = np.asarray(hmm_gaussian.align(params, fc))
    sm = np.asarray(fc.src_mask())
    word_mask = sm & (fg.alignment > 0)
    acc = (pred == fg.alignment)[word_mask].mean()
    assert acc > 0.7, acc


def test_posterior_gamma_normalized(frames):
    fc, _ = frames
    params = hmm_gaussian.init(fc, key=jax.random.PRNGKey(0))
    log_init, log_trans, log_emit = hmm_gaussian._machinery(params, fc)
    from multimodalworddiscovery_tpu.models import hmm_core
    from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF

    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, fc.src_len)
    betas = hmm_core.backward(log_trans, log_emit, fc.src_len)
    gamma = np.exp(np.asarray(alphas + betas) - np.asarray(logz)[None, :, None])
    sl = np.asarray(fc.src_len)
    for i in range(0, fc.n, 7):
        for t in range(0, sl[i], 5):
            np.testing.assert_allclose(gamma[t, i].sum(), 1.0, rtol=1e-3)
