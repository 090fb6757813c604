import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import attention


@pytest.fixture(scope="module")
def mini():
    return make_flickr8k_mini(n_utterances=120, seed=11)


def test_shapes_and_masking(mini):
    corpus, _, _ = mini
    state = attention.init(corpus)
    attn = np.asarray(attention.attention_matrix(state, corpus))
    assert attn.shape == (corpus.n, corpus.max_trg_len, corpus.max_src_len)
    # on valid decoder rows, attention over padded source positions is ~zero
    sm = np.asarray(corpus.src_mask())
    tm = np.asarray(corpus.trg_mask())
    valid_rows = np.broadcast_to(tm[:, :, None], attn.shape)
    pad_src = ~np.broadcast_to(sm[:, None, :], attn.shape)
    assert attn[valid_rows & pad_src].max() < 1e-6
    # valid rows sum to 1
    row_sums = attn.sum(-1)[tm]
    np.testing.assert_allclose(row_sums, 1.0, rtol=1e-4)


@pytest.mark.slow
def test_loss_decreases(mini):
    corpus, _, _ = mini
    state = attention.init(corpus)
    _, s0 = attention.em_step(state, corpus)
    state, lls = jax.jit(lambda s: attention.train(s, corpus, 60))(state)
    lls = np.asarray(lls)
    assert lls[-1] > lls[0] + 10, (lls[0], lls[-1])


@pytest.mark.slow
def test_alignment_better_than_chance(mini):
    corpus, gold, _ = mini
    state = attention.init(corpus)
    state, _ = jax.jit(lambda s: attention.train(s, corpus, 300))(state)
    pred = np.asarray(attention.align(state, corpus))
    sm = np.asarray(corpus.src_mask())
    word_mask = sm & (gold.alignment > 0)
    acc = (pred == gold.alignment)[word_mask].mean()
    # Attention alignment is noisier than the EM aligners (and this tiny
    # 120-utterance corpus invites memorization with diffuse attention);
    # position-match chance is ~0.33 for 2-4 concepts.  Regression floor:
    assert acc > 0.38, acc


def test_align_works_on_continuous_features(mini):
    corpus, gold, _ = mini
    small_c, small_g, _ = make_flickr8k_mini(n_utterances=16, seed=12)
    fc, fg, _ = phones_to_frames(small_c, small_g, feat_dim=8, seed=12)
    state = attention.init(fc)
    state, stats = jax.jit(attention.em_step)(state, fc)
    a = np.asarray(attention.align(state, fc))
    assert a.shape == (fc.n, fc.max_src_len)
    assert np.isfinite(float(stats["loss"]))


@pytest.mark.slow
def test_guided_attention_beats_plain(mini):
    """HMM-posterior-guided attention (DNN-HMM-DNN hybrid style) should align
    much better than plain CE attention."""
    from multimodalworddiscovery_tpu.models import hmm

    corpus, gold, _ = mini
    hp = hmm.init(corpus)
    hp, _ = jax.jit(lambda p: hmm.train(p, corpus, 12))(hp)
    guide = attention.hmm_guide_matrix(hp, corpus)
    g = np.asarray(guide)
    # teacher rows are distributions over valid source positions
    tm = np.asarray(corpus.trg_mask())
    sums = g.sum(-1)[tm]
    assert np.all(sums < 1.0 + 1e-4)
    assert (sums > 0.9).mean() > 0.9  # most rows nearly fully assigned

    sm = np.asarray(corpus.src_mask())
    wm = sm & (gold.alignment > 0)

    plain = attention.init(corpus)
    plain, _ = jax.jit(lambda s: attention.train(s, corpus, 150))(plain)
    acc_plain = (np.asarray(attention.align(plain, corpus)) == gold.alignment)[wm].mean()

    guided = attention.init(corpus)
    guided, _ = jax.jit(lambda s: attention.train(s, corpus, 150, guide))(guided)
    acc_guided = (np.asarray(attention.align(guided, corpus)) == gold.alignment)[wm].mean()

    assert acc_guided > acc_plain + 0.1, (acc_plain, acc_guided)


@pytest.mark.slow
def test_subsampled_attention_on_frames():
    """Conv-subsampled encoder (ASR-style) on acoustic frames: shapes map
    back to frame resolution and training improves alignment."""
    small_c, small_g, _ = make_flickr8k_mini(n_utterances=60, seed=13)
    fc, fg, _ = phones_to_frames(small_c, small_g, feat_dim=8, noise=0.05, seed=13)
    state = attention.init(fc, subsample=2, key=jax.random.PRNGKey(0))
    attn = np.asarray(attention.attention_matrix(state, fc))
    assert attn.shape == (fc.n, fc.max_trg_len, fc.max_src_len)
    state, lls = jax.jit(lambda s: attention.train(s, fc, 120))(state)
    lls = np.asarray(lls)
    assert lls[-1] > lls[0]
    a = np.asarray(attention.align(state, fc))
    assert a.shape == (fc.n, fc.max_src_len)
    sm = np.asarray(fc.src_mask())
    assert (a[~sm] == 0).all()


@pytest.mark.slow
def test_guided_attention_with_subsample():
    """The teacher guide pools onto subsampled positions — guided training
    composes with the conv stride front end (round-1 raised an error here)."""
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import hmm_gaussian

    corpus, gold, _ = make_flickr8k_mini(n_utterances=60, seed=23)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=12, noise=0.1, seed=23)
    hp = hmm_gaussian.init(fc, n_components=2, key=jax.random.PRNGKey(0))
    hp, _ = jax.jit(lambda p: hmm_gaussian.train(p, fc, 10))(hp)
    guide = attention.hmm_guide_matrix(hp, fc, posteriors_fn=hmm_gaussian.posteriors)

    state = attention.init(fc, dim=64, subsample=2, key=jax.random.PRNGKey(1))
    state, lls = jax.jit(lambda s: attention.train(s, fc, 150, guide))(state)
    lls = np.asarray(lls)
    assert np.isfinite(lls).all()

    pred = np.asarray(attention.align(state, fc))
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    acc = (pred == fg.alignment)[wm].mean()
    # guided + subsampled must clearly beat unguided subsampled (~0.6) and
    # approach the teacher's ballpark
    assert acc > 0.68, acc
