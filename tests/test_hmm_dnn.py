import jax
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import hmm_dnn


@pytest.fixture(scope="module")
def frames():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=80, seed=41)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=12, noise=0.1, seed=41)
    return fc, fg


def test_shapes_and_finiteness(frames):
    fc, _ = frames
    params = hmm_dnn.init(fc, key=jax.random.PRNGKey(0))
    params, stats = jax.jit(hmm_dnn.em_step)(params, fc)
    assert np.isfinite(float(stats["loglik"]))
    assert np.isfinite(float(stats["ce"]))
    a = np.asarray(hmm_dnn.align(params, fc))
    assert a.shape == (fc.n, fc.max_src_len)
    assert (a[~np.asarray(fc.src_mask())] == 0).all()


def test_training_improves_loglik_and_alignment(frames):
    fc, fg = frames
    params = hmm_dnn.init(fc, key=jax.random.PRNGKey(1))
    params, lls = jax.jit(lambda p: hmm_dnn.train(p, fc, 10))(params)
    lls = np.asarray(lls)
    # generalized EM: overall upward trend (not strictly monotone)
    assert lls[-1] > lls[0], lls
    pred = np.asarray(hmm_dnn.align(params, fc))
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    acc = (pred == fg.alignment)[wm].mean()
    assert acc > 0.55, acc


def test_posteriors_normalized(frames):
    fc, _ = frames
    params = hmm_dnn.init(fc, key=jax.random.PRNGKey(2))
    post = np.asarray(hmm_dnn.posteriors(params, fc))
    sl = np.asarray(fc.src_len)
    for i in (0, 5):
        for t in range(0, sl[i], 7):
            np.testing.assert_allclose(post[i, t].sum(), 1.0, rtol=1e-3)
