import jax
import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.bucketing import bucket_corpus, padding_waste
from multimodalworddiscovery_tpu.models import bucketed, hmm, model1


def test_bucketing_partitions_corpus():
    corpus, _, _ = make_flickr8k_mini(n_utterances=50, seed=6)
    buckets = bucket_corpus(corpus, [10, 16])
    all_idx = np.concatenate([idx for _, idx in buckets])
    assert sorted(all_idx.tolist()) == list(range(50))
    sl = np.asarray(corpus.src_len)
    for b, idx in buckets:
        np.testing.assert_array_equal(np.asarray(b.src_len), sl[idx])
        # bucket padding <= global padding
        assert b.max_src_len <= corpus.max_src_len
    # bucketing reduces padding waste on this corpus
    total_waste = sum(padding_waste(b) * b.n * b.max_src_len for b, _ in buckets)
    assert total_waste < padding_waste(corpus) * corpus.n * corpus.max_src_len


def test_bucketed_em_matches_full_model1():
    corpus, _, _ = make_flickr8k_mini(n_utterances=40, seed=7)
    p_full = model1.init(corpus)
    for _ in range(4):
        p_full, _ = model1.em_step(p_full, corpus)

    p_b, lls = bucketed.train_bucketed(model1, model1.init(corpus), corpus, [12], 4)
    np.testing.assert_allclose(
        np.asarray(p_b.log_t), np.asarray(p_full.log_t), rtol=1e-4, atol=1e-4
    )


def test_bucketed_em_matches_full_hmm():
    corpus, _, _ = make_flickr8k_mini(n_utterances=30, seed=8)
    p_full = hmm.init(corpus)
    lls_full = []
    for _ in range(3):
        p_full, s = hmm.em_step(p_full, corpus)
        lls_full.append(float(s["loglik"]))

    p_b, lls_b = bucketed.train_bucketed(hmm, hmm.init(corpus), corpus, [12], 3)
    np.testing.assert_allclose(lls_b, lls_full, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p_b.log_emit), np.asarray(p_full.log_emit), rtol=1e-3, atol=1e-3
    )
    # bucketed decode matches full decode
    a_full = np.asarray(hmm.align(p_full, corpus))
    a_b = bucketed.align_bucketed(hmm, p_b, corpus, [12])
    assert (a_full == a_b).mean() > 0.999


def _continuous_corpus(n=24, seed=11):
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

    corpus, gold, _ = make_flickr8k_mini(n_utterances=n, seed=seed)
    corpus, gold, _ = phones_to_frames(corpus, gold, feat_dim=8, seed=seed)
    return corpus


def test_bucketed_em_matches_full_hmm_gaussian():
    from multimodalworddiscovery_tpu.models import hmm_gaussian

    corpus = _continuous_corpus()
    key = jax.random.PRNGKey(0)
    p_full = hmm_gaussian.init(corpus, n_components=2, key=key)
    lls_full = []
    for _ in range(3):
        p_full, s = hmm_gaussian.em_step(p_full, corpus, smoothing=1e-6)
        lls_full.append(float(s["loglik"]))

    edges = [int(np.median(np.asarray(corpus.src_len)))]
    p_b, lls_b = bucketed.train_bucketed(
        hmm_gaussian, hmm_gaussian.init(corpus, n_components=2, key=key),
        corpus, edges, 3, smoothing=1e-6,
    )
    np.testing.assert_allclose(lls_b, lls_full, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p_b.means), np.asarray(p_full.means), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(p_b.log_vars), np.asarray(p_full.log_vars), rtol=1e-3, atol=1e-3
    )


def test_bucketed_em_matches_full_hmm_dnn():
    from multimodalworddiscovery_tpu.models import hmm_dnn

    corpus = _continuous_corpus(n=20, seed=12)
    key = jax.random.PRNGKey(1)
    p_full = hmm_dnn.init(corpus, hidden=32, n_sgd=2, key=key)
    lls_full = []
    for _ in range(2):
        p_full, s = hmm_dnn.em_step(p_full, corpus, smoothing=1e-6)
        lls_full.append(float(s["loglik"]))

    edges = [int(np.median(np.asarray(corpus.src_len)))]
    p_b, lls_b = bucketed.train_bucketed(
        hmm_dnn, hmm_dnn.init(corpus, hidden=32, n_sgd=2, key=key),
        corpus, edges, 2, smoothing=1e-6,
    )
    np.testing.assert_allclose(lls_b, lls_full, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p_b.log_prior), np.asarray(p_full.log_prior), rtol=1e-4, atol=1e-4
    )
    # the neural M-step's pooled-gradient update matches the fused scan
    flat_b = jax.tree_util.tree_leaves(p_b.mlp)
    flat_f = jax.tree_util.tree_leaves(p_full.mlp)
    for a, b in zip(flat_b, flat_f):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)


def test_bucketed_em_data_parallel_mesh():
    from multimodalworddiscovery_tpu.core.mesh import make_mesh

    corpus, _, _ = make_flickr8k_mini(n_utterances=30, seed=8)
    p_full = hmm.init(corpus)
    for _ in range(2):
        p_full, _ = hmm.em_step(p_full, corpus)

    mesh = make_mesh()
    p_b, _ = bucketed.train_bucketed(
        hmm, hmm.init(corpus), corpus, [12], 2, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(p_b.log_emit), np.asarray(p_full.log_emit), rtol=1e-3, atol=1e-3
    )


def test_bucketed_on_iteration_callback():
    corpus, _, _ = make_flickr8k_mini(n_utterances=20, seed=5)
    seen = []
    bucketed.train_bucketed(
        hmm, hmm.init(corpus), corpus, [12], 3,
        on_iteration=lambda it, p, ll: seen.append((it, ll)),
    )
    assert [it for it, _ in seen] == [0, 1, 2]
    assert all(np.isfinite(ll) for _, ll in seen)


def test_min_bucket_size_never_drops_utterances():
    corpus, _, _ = make_flickr8k_mini(n_utterances=30, seed=9)
    # absurd min size: everything must still land somewhere (the rest bucket)
    buckets = bucket_corpus(corpus, [5, 10, 15], min_bucket_size=100)
    all_idx = np.concatenate([idx for _, idx in buckets])
    assert sorted(all_idx.tolist()) == list(range(30))


def test_chunked_expected_counts_matches_unchunked():
    corpus, _, _ = make_flickr8k_mini(n_utterances=37, seed=19)  # not divisible
    params = hmm.init(corpus)
    params, _ = hmm.em_step(params, corpus)
    want, ll_want = jax.jit(hmm.expected_counts)(params, corpus)
    got, ll_got = jax.jit(
        lambda p, c: bucketed.chunked_expected_counts(hmm, p, c, num_chunks=5)
    )(params, corpus)
    np.testing.assert_allclose(float(ll_got), float(ll_want), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    # model1 (no use_pallas kwarg) goes through the same helper
    p1 = model1.init(corpus)
    w1, lw = jax.jit(model1.expected_counts)(p1, corpus)
    g1, lg = jax.jit(
        lambda p, c: bucketed.chunked_expected_counts(model1, p, c, num_chunks=4)
    )(p1, corpus)
    np.testing.assert_allclose(float(lg), float(lw), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(w1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
