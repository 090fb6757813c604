import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.eval.dtw import dtw_distance
from multimodalworddiscovery_tpu.eval.metrics import (
    alignment_prf,
    boundary_prf,
    cluster_purity,
    word_iou,
)
from multimodalworddiscovery_tpu.eval.retrieval import recall_at_k, retrieval_scores_model1
from multimodalworddiscovery_tpu.models import model1
from multimodalworddiscovery_tpu.oracles import numpy_metrics as om
from multimodalworddiscovery_tpu.segment import boundaries_from_segments, segments_from_alignment, segments_to_host


@pytest.fixture(scope="module")
def setup():
    corpus, gold, meta = make_flickr8k_mini(n_utterances=60, seed=0)
    rng = np.random.default_rng(0)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    # noisy predictions: gold with 25% random corruption
    pred = gold.alignment.copy()
    for i in range(corpus.n):
        for t in range(sl[i]):
            if rng.random() < 0.25:
                pred[i, t] = rng.integers(0, tl[i] + 1)
    return corpus, gold, meta, pred


def _seg_both(corpus, gold, pred):
    pred_segs, pred_mask = segments_from_alignment(
        jnp.asarray(pred), corpus.trg, corpus.src_len
    )
    gold_segs, gold_mask = segments_from_alignment(
        jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
    )
    return pred_segs, pred_mask, gold_segs, gold_mask


def test_alignment_prf_matches_oracle(setup):
    corpus, gold, _, pred = setup
    sl = np.asarray(corpus.src_len)
    got = jax.tree.map(float, alignment_prf(jnp.asarray(pred), jnp.asarray(gold.alignment), corpus.src_mask()))
    want = om.alignment_prf_np(pred, gold.alignment, sl)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)


def test_alignment_prf_perfect_is_one(setup):
    corpus, gold, _, _ = setup
    out = alignment_prf(jnp.asarray(gold.alignment), jnp.asarray(gold.alignment), corpus.src_mask())
    assert float(out["f1"]) == 1.0 and float(out["aer"]) == 0.0


def test_word_iou_matches_oracle(setup):
    corpus, gold, _, pred = setup
    ps, pm, gs, gm = _seg_both(corpus, gold, pred)
    got = jax.tree.map(float, word_iou(ps, pm, gs, gm))
    want = om.word_iou_np(segments_to_host(ps, pm), segments_to_host(gs, gm))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)


def test_boundary_prf_matches_oracle(setup):
    corpus, gold, _, pred = setup
    ps, pm, gs, gm = _seg_both(corpus, gold, pred)
    pb = boundaries_from_segments(ps, pm, corpus.max_src_len)
    gb = boundaries_from_segments(gs, gm, corpus.max_src_len)
    sl = np.asarray(corpus.src_len)
    for tol in (0, 1, 2):
        got = jax.tree.map(float, boundary_prf(pb, gb, tolerance=tol))
        want = om.boundary_prf_np(
            segments_to_host(ps, pm), segments_to_host(gs, gm), sl, tolerance=tol
        )
        for k in want:
            np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=f"{k}@tol{tol}")


def test_cluster_purity_matches_oracle(setup):
    corpus, gold, meta, pred = setup
    ps, pm, gs, gm = _seg_both(corpus, gold, pred)
    got = float(cluster_purity(ps, pm, gs, gm, corpus.trg_vocab))
    want = om.cluster_purity_np(
        segments_to_host(ps, pm), segments_to_host(gs, gm), corpus.trg_vocab
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cluster_purity_perfect(setup):
    corpus, gold, _, _ = setup
    gs, gm = segments_from_alignment(jnp.asarray(gold.alignment), corpus.trg, corpus.src_len)
    assert float(cluster_purity(gs, gm, gs, gm, corpus.trg_vocab)) == 1.0


def test_cluster_nmi_matches_oracle(setup):
    from multimodalworddiscovery_tpu.eval.metrics import cluster_nmi

    corpus, gold, meta, pred = setup
    ps, pm, gs, gm = _seg_both(corpus, gold, pred)
    got = float(cluster_nmi(ps, pm, gs, gm, corpus.trg_vocab))
    want = om.cluster_nmi_np(
        segments_to_host(ps, pm), segments_to_host(gs, gm), corpus.trg_vocab
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # perfect clustering: NMI = 1
    assert float(cluster_nmi(gs, gm, gs, gm, corpus.trg_vocab)) == pytest.approx(1.0)
    assert 0.0 <= got <= 1.0


def test_dtw_matches_oracle():
    rng = np.random.default_rng(0)
    B, T1, T2, D = 6, 17, 23, 5
    x = rng.normal(size=(B, T1, D)).astype(np.float32)
    y = rng.normal(size=(B, T2, D)).astype(np.float32)
    lx = rng.integers(3, T1 + 1, size=B).astype(np.int32)
    ly = rng.integers(3, T2 + 1, size=B).astype(np.int32)
    for metric in ("sqeuclidean", "euclidean", "cosine"):
        got = np.asarray(dtw_distance(jnp.asarray(x), jnp.asarray(y), jnp.asarray(lx), jnp.asarray(ly), metric=metric))
        want = np.array([om.dtw_np(x[b, : lx[b]], y[b, : ly[b]], metric=metric) for b in range(B)])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4, err_msg=metric)


def test_dtw_identity_is_zero():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 10, 4)).astype(np.float32)
    lens = jnp.asarray([10, 7, 5], dtype=jnp.int32)
    d = np.asarray(dtw_distance(jnp.asarray(x), jnp.asarray(x), lens, lens))
    np.testing.assert_allclose(d, 0.0, atol=1e-4)


def test_retrieval_recall(setup):
    corpus, gold, _, _ = setup
    params = model1.init(corpus)
    params, _ = jax.jit(lambda p: model1.train(p, corpus, 12))(params)
    scores = retrieval_scores_model1(params, corpus)
    assert scores.shape == (corpus.n, corpus.n)
    out = jax.tree.map(float, recall_at_k(scores, ks=(1, 5, 10)))
    # trained model should rank the true image far above chance (1/60)
    assert out["recall@5_c2i"] > 0.5, out
    assert out["recall@10_i2c"] > 0.5, out
    assert out["recall@1_c2i"] >= out["recall@1_c2i"] * 0  # sanity: finite
    # perfect-score sanity: diagonal boosted -> recall@1 == 1
    boosted = scores + jnp.eye(corpus.n) * 1e6
    out2 = recall_at_k(boosted, ks=(1,))
    assert float(out2["recall@1_c2i"]) == 1.0
    assert float(out2["recall@1_i2c"]) == 1.0


def test_retrieval_hmm(setup):
    from multimodalworddiscovery_tpu.eval.retrieval import retrieval_scores_hmm
    from multimodalworddiscovery_tpu.models import hmm

    corpus, gold, _, _ = setup
    params = hmm.init(corpus)
    params, _ = jax.jit(lambda p: hmm.train(p, corpus, 8))(params)
    scores = retrieval_scores_hmm(params, corpus)
    assert scores.shape == (corpus.n, corpus.n)
    # diagonal scores should equal the per-utterance forward loglik
    from multimodalworddiscovery_tpu.models import hmm_core
    li, lt, le = hmm._machinery(params, corpus)
    _, logz = hmm_core.forward(li, lt, le, corpus.src_len)
    np.testing.assert_allclose(
        np.diagonal(np.asarray(scores)), np.asarray(logz), rtol=1e-4
    )
    out = recall_at_k(scores, ks=(5,))
    assert float(out["recall@5_c2i"]) > 0.4, out


def test_segment_dtw_matrix():
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.dtw import segment_dtw_matrix
    from multimodalworddiscovery_tpu.segment import segments_from_alignment

    corpus, gold, _ = make_flickr8k_mini(n_utterances=8, seed=9)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=6, noise=0.05, seed=9)
    segs, mask = segments_from_alignment(
        jnp.asarray(fg.alignment), fc.trg, fc.src_len
    )
    dist, index = segment_dtw_matrix(fc.src, segs, mask, max_seg_len=16)
    dist = np.asarray(dist)
    mask_np = np.asarray(mask).reshape(-1)
    segs_np = np.asarray(segs).reshape(-1, 3)
    valid = np.where(mask_np)[0]
    # self-distance ~0
    np.testing.assert_allclose(dist[valid, valid], 0.0, atol=1e-3)
    # same-concept segments (same word, noisy frames) are closer on average
    # than different-concept segments
    concepts = segs_np[:, 2]
    same, diff = [], []
    for a in valid[:30]:
        for b in valid[:30]:
            if a == b:
                continue
            (same if concepts[a] == concepts[b] else diff).append(dist[a, b])
    assert np.mean(same) < np.mean(diff), (np.mean(same), np.mean(diff))


def test_cluster_dtw_coherence_and_gold():
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.dtw import cluster_dtw_coherence, dtw_to_gold
    from multimodalworddiscovery_tpu.segment import segments_from_alignment

    corpus, gold, _ = make_flickr8k_mini(n_utterances=8, seed=9)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=6, noise=0.05, seed=9)
    segs, mask = segments_from_alignment(
        jnp.asarray(fg.alignment), fc.trg, fc.src_len
    )
    coh = cluster_dtw_coherence(fc.src, segs, mask, max_seg_len=16)
    # same-word segments are noisy repeats of the same frames: coherent
    assert float(coh["ratio"]) < 0.8, {k: float(v) for k, v in coh.items()}
    assert float(coh["within"]) >= 0.0

    # gold vs itself: every predicted unit has an exact gold twin
    d_self = dtw_to_gold(fc.src, segs, mask, segs, mask, max_seg_len=16)
    np.testing.assert_allclose(float(d_self), 0.0, atol=1e-4)

    # shift every predicted segment by 2 frames: distance must grow
    shifted = jnp.stack(
        [segs[..., 0] + 2, segs[..., 1] + 2, segs[..., 2]], axis=-1
    )
    d_shift = dtw_to_gold(fc.src, shifted, mask, segs, mask, max_seg_len=16)
    assert float(d_shift) > float(d_self) + 1e-3


def test_pooled_retrieval_matches_dense_column0():
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k_pooled,
        retrieval_scores_hmm,
        retrieval_scores_hmm_pooled,
        retrieval_scores_model1,
        retrieval_scores_model1_pooled,
        sample_candidate_pools,
    )
    from multimodalworddiscovery_tpu.models import model1

    corpus, _, _ = make_flickr8k_mini(n_utterances=24, seed=4)
    params = model1.init(corpus)
    for _ in range(6):
        params, _ = model1.em_step(params, corpus)

    cand = sample_candidate_pools(corpus.n, 8, jax.random.PRNGKey(0))
    assert np.all(np.asarray(cand)[:, 0] == np.arange(24))
    assert not np.any(np.asarray(cand)[:, 1:] == np.arange(24)[:, None])

    pooled = retrieval_scores_model1_pooled(params, corpus, cand)
    dense = retrieval_scores_model1(params, corpus)
    # column 0 scores the true pairing: must equal the dense diagonal
    np.testing.assert_allclose(
        np.asarray(pooled)[:, 0], np.diagonal(np.asarray(dense)), rtol=1e-4
    )
    # every pooled entry equals the corresponding dense entry
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(dense)[np.arange(24)[:, None], np.asarray(cand)],
        rtol=1e-4,
    )
    out = recall_at_k_pooled(pooled, ks=(1,))
    assert 0.0 <= float(out["recall@1_c2i"]) <= 1.0

    from multimodalworddiscovery_tpu.models import hmm

    hp = hmm.init(corpus)
    for _ in range(6):
        hp, _ = hmm.em_step(hp, corpus)
    pooled_h = retrieval_scores_hmm_pooled(hp, corpus, cand)
    dense_h = retrieval_scores_hmm(hp, corpus)
    np.testing.assert_allclose(
        np.asarray(pooled_h),
        np.asarray(dense_h)[np.arange(24)[:, None], np.asarray(cand)],
        rtol=1e-4, atol=1e-4,
    )


def test_pooled_retrieval_grounding():
    from multimodalworddiscovery_tpu.eval.retrieval import sample_candidate_pools
    from multimodalworddiscovery_tpu.models import grounding

    corpus, _, _ = make_flickr8k_mini(n_utterances=16, seed=5)
    state = grounding.init(corpus, dim=32, key=jax.random.PRNGKey(0))
    cand = sample_candidate_pools(corpus.n, 6, jax.random.PRNGKey(1))
    pooled = grounding.retrieval_scores_pooled(state, corpus, cand)
    dense = grounding.retrieval_scores(state, corpus)
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(dense)[np.arange(16)[:, None], np.asarray(cand)],
        rtol=1e-4, atol=1e-5,
    )


def test_pooled_retrieval_i2c_matches_dense_transpose():
    """Annotation direction (i2c): pooled[i, j] scores candidate caption
    cand[i, j] against image i, so it must equal dense[cand[i, j], i]
    for every pooled scorer (dense rows = captions, cols = images)."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k_pooled,
        retrieval_scores_hmm_family,
        retrieval_scores_hmm_family_pooled,
        retrieval_scores_model1,
        retrieval_scores_model1_pooled,
        sample_candidate_pools,
    )
    from multimodalworddiscovery_tpu.models import grounding, hmm, model1

    corpus, _, _ = make_flickr8k_mini(n_utterances=16, seed=7)
    cand = sample_candidate_pools(corpus.n, 6, jax.random.PRNGKey(2))
    rows = np.asarray(cand)

    params = model1.init(corpus)
    for _ in range(4):
        params, _ = model1.em_step(params, corpus)
    pooled = retrieval_scores_model1_pooled(params, corpus, cand, direction="i2c")
    dense = np.asarray(retrieval_scores_model1(params, corpus))
    np.testing.assert_allclose(
        np.asarray(pooled), dense[rows, np.arange(16)[:, None]], rtol=1e-4
    )
    out = recall_at_k_pooled(pooled, ks=(1,), direction="i2c")
    assert "recall@1_i2c" in out and "median_rank_i2c" in out

    hp = hmm.init(corpus)
    pooled_h = retrieval_scores_hmm_family_pooled(
        hmm, hp, corpus, cand, batch_size=4, direction="i2c"
    )
    dense_h = np.asarray(retrieval_scores_hmm_family(hmm, hp, corpus, batch_size=4))
    np.testing.assert_allclose(
        np.asarray(pooled_h), dense_h[rows, np.arange(16)[:, None]],
        rtol=1e-4, atol=1e-4,
    )

    state = grounding.init(corpus, dim=32, key=jax.random.PRNGKey(0))
    pooled_g = grounding.retrieval_scores_pooled(state, corpus, cand, direction="i2c")
    dense_g = np.asarray(grounding.retrieval_scores(state, corpus))
    np.testing.assert_allclose(
        np.asarray(pooled_g), dense_g[rows, np.arange(16)[:, None]],
        rtol=1e-4, atol=1e-5,
    )


def test_retrieval_hmm_family_gaussian():
    """Continuous-emission aligners score retrieval through the same
    re-pairing forward (reference scored retrieval from alignment probs)."""
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k,
        retrieval_scores_hmm_family,
    )
    from multimodalworddiscovery_tpu.models import hmm_gaussian

    corpus, gold, _ = make_flickr8k_mini(n_utterances=20, seed=6)
    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=6)
    params = hmm_gaussian.init(fc, n_components=2, key=jax.random.PRNGKey(0))
    params, _ = jax.jit(lambda p: hmm_gaussian.train(p, fc, 8))(params)
    scores = retrieval_scores_hmm_family(hmm_gaussian, params, fc, batch_size=4)
    assert scores.shape == (20, 20)
    out = recall_at_k(scores, ks=(5,))
    # trained model ranks the true image well above chance (5/20 = 0.25)
    assert float(out["recall@5_c2i"]) > 0.5, out


def test_candidate_pools_are_distinct():
    from multimodalworddiscovery_tpu.eval.retrieval import sample_candidate_pools

    cand = np.asarray(sample_candidate_pools(50, 20, jax.random.PRNGKey(3)))
    for row in cand:
        assert len(set(row.tolist())) == 20, row  # no duplicate distractors
    assert np.all(cand[:, 0] == np.arange(50))


def test_pooled_retrieval_hmm_family():
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.retrieval import (
        retrieval_scores_hmm_family,
        retrieval_scores_hmm_family_pooled,
        sample_candidate_pools,
    )
    from multimodalworddiscovery_tpu.models import hmm_gaussian

    corpus, gold, _ = make_flickr8k_mini(n_utterances=16, seed=6)
    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.1, seed=6)
    params = hmm_gaussian.init(fc, n_components=1, key=jax.random.PRNGKey(0))
    cand = sample_candidate_pools(16, 5, jax.random.PRNGKey(1))
    pooled = retrieval_scores_hmm_family_pooled(hmm_gaussian, params, fc, cand, batch_size=4)
    dense = retrieval_scores_hmm_family(hmm_gaussian, params, fc, batch_size=4)
    np.testing.assert_allclose(
        np.asarray(pooled),
        np.asarray(dense)[np.arange(16)[:, None], np.asarray(cand)],
        rtol=1e-4, atol=1e-4,
    )


def test_rank_helpers_consistent_with_pooled_recall():
    """recall_at_k_pooled == recall_from_ranks(ranks_from_pooled(.)) and the
    rank vector is the documented streamable sufficient statistic: the
    metrics of a concatenation equal the metrics of the whole score matrix
    split into arbitrary row blocks."""
    import numpy as _np

    from multimodalworddiscovery_tpu.eval.retrieval import (
        ranks_from_pooled,
        recall_at_k_pooled,
        recall_from_ranks,
    )

    rng = _np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(size=(37, 9)).astype(_np.float32))
    whole = recall_at_k_pooled(scores, direction="c2i")
    parts = _np.concatenate([
        _np.asarray(ranks_from_pooled(scores[:13])),
        _np.asarray(ranks_from_pooled(scores[13:])),
    ])
    split = recall_from_ranks(parts, scores.shape[1], direction="c2i")
    for k, v in whole.items():
        _np.testing.assert_allclose(float(split[k]), float(v), err_msg=k)


def test_dense_candidate_pools_structure():
    """Row i is a permutation of [0, n) starting at i (column 0 = self)."""
    import numpy as _np

    from multimodalworddiscovery_tpu.eval.retrieval import (
        dense_candidate_pools,
    )

    cand = _np.asarray(dense_candidate_pools(7))
    assert cand.shape == (7, 7)
    _np.testing.assert_array_equal(cand[:, 0], _np.arange(7))
    for i in range(7):
        _np.testing.assert_array_equal(_np.sort(cand[i]), _np.arange(7))
