import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.eval.retrieval import recall_at_k
from multimodalworddiscovery_tpu.models import grounding


@pytest.fixture(scope="module")
def mini():
    return make_flickr8k_mini(n_utterances=80, seed=31)


@pytest.mark.slow
def test_loss_decreases(mini):
    corpus, _, _ = mini
    state = grounding.init(corpus)
    _, s0 = grounding.em_step(state, corpus)
    state, lls = jax.jit(lambda s: grounding.train(s, corpus, 80))(state)
    lls = np.asarray(lls)  # -loss
    assert lls[-1] > lls[0], (lls[0], lls[-1])


@pytest.mark.slow
def test_retrieval_improves_over_training(mini):
    corpus, _, _ = mini
    state = grounding.init(corpus)
    before = recall_at_k(grounding.retrieval_scores(state, corpus), ks=(5,))
    state, _ = jax.jit(lambda s: grounding.train(s, corpus, 150))(state)
    after = recall_at_k(grounding.retrieval_scores(state, corpus), ks=(5,))
    assert float(after["recall@5_c2i"]) > float(before["recall@5_c2i"])
    assert float(after["recall@5_c2i"]) > 0.3, after


def test_align_shape_and_masking(mini):
    corpus, gold, _ = mini
    state = grounding.init(corpus)
    a = np.asarray(grounding.align(state, corpus))
    sm = np.asarray(corpus.src_mask())
    tl = np.asarray(corpus.trg_len)
    assert a.shape == (corpus.n, corpus.max_src_len)
    assert (a[~sm] == 0).all()
    for i in range(corpus.n):
        assert a[i].max() <= tl[i]


def test_training_survives_zero_padded_region_rows():
    """Exactly-zero continuous region rows (detector-proposal padding) must
    not NaN the gradients: x/max(||x||,eps) has a NaN gradient at x==0
    (observed poisoning Adam on scripts/image_pipeline.py); the encoders
    normalize with rsqrt(sum_sq + eps) instead."""
    from multimodalworddiscovery_tpu.data.corpus import Corpus

    rng = np.random.default_rng(0)
    n, ts, k, d = 16, 12, 5, 32
    src = rng.normal(size=(n, ts, 8)).astype(np.float32)
    trg = rng.normal(size=(n, k, d)).astype(np.float32)
    trg_len = rng.integers(2, k, size=n).astype(np.int32)
    for i in range(n):
        trg[i, trg_len[i]:] = 0.0  # exact zeros, like compacted proposals
    corpus = Corpus(
        src=jnp.asarray(src), src_len=jnp.full((n,), ts, jnp.int32),
        trg=jnp.asarray(trg), trg_len=jnp.asarray(trg_len),
        src_vocab=0, trg_vocab=0,
    )
    state = grounding.init(corpus, dim=16, key=jax.random.PRNGKey(0))
    state, lls = jax.jit(lambda s: grounding.train(s, corpus, 10))(state)
    lls = np.asarray(lls)
    assert np.isfinite(lls).all(), lls
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(p)).all() for p in leaves)
