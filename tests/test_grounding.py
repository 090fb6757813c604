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


def test_loss_decreases(mini):
    corpus, _, _ = mini
    state = grounding.init(corpus)
    _, s0 = grounding.em_step(state, corpus)
    state, lls = jax.jit(lambda s: grounding.train(s, corpus, 80))(state)
    lls = np.asarray(lls)  # -loss
    assert lls[-1] > lls[0], (lls[0], lls[-1])


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
