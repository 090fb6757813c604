import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import model1
from multimodalworddiscovery_tpu.oracles.numpy_model1 import NumpyModel1


def _ragged(corpus):
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    return (
        [src[i, : sl[i]] for i in range(corpus.n)],
        [trg[i, : tl[i]] for i in range(corpus.n)],
    )


def test_posteriors_rows_sum_to_one():
    corpus, _, _ = make_flickr8k_mini(n_utterances=16, seed=0)
    params = model1.init(corpus)
    gamma = np.asarray(model1.posteriors(params, corpus))
    sm = np.asarray(corpus.src_mask())
    np.testing.assert_allclose(gamma.sum(-1)[sm], 1.0, rtol=1e-4)
    assert (gamma.sum(-1)[~sm] == 0).all()


def test_em_matches_numpy_oracle():
    corpus, _, _ = make_flickr8k_mini(n_utterances=32, seed=1)
    src_seqs, trg_seqs = _ragged(corpus)
    oracle = NumpyModel1(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)

    params = model1.init(corpus)
    step = jax.jit(model1.em_step)
    for it in range(5):
        oracle_ll = oracle.em_iteration()
        params, stats = step(params, corpus)
        np.testing.assert_allclose(float(stats["loglik"]), oracle_ll, rtol=1e-4)
        np.testing.assert_allclose(
            np.exp(np.asarray(params.log_t, dtype=np.float64)),
            oracle.t,
            rtol=2e-3,
            atol=1e-6,
        )

    # decode parity
    ours = np.asarray(model1.align(params, corpus))
    theirs = oracle.align()
    sl = np.asarray(corpus.src_len)
    for i, a in enumerate(theirs):
        np.testing.assert_array_equal(ours[i, : sl[i]], a)


def test_em_monotone_loglik():
    corpus, _, _ = make_flickr8k_mini(n_utterances=40, seed=2)
    params = model1.init(corpus)
    _, lls = jax.jit(lambda p: model1.train(p, corpus, 8))(params)
    lls = np.asarray(lls)
    assert np.all(np.diff(lls) > -1e-3), lls


def test_padding_invariance():
    corpus, _, _ = make_flickr8k_mini(n_utterances=12, seed=3)
    src_seqs, trg_seqs = _ragged(corpus)
    wider = Corpus.from_ragged(
        src_seqs,
        trg_seqs,
        src_vocab=corpus.src_vocab,
        trg_vocab=corpus.trg_vocab,
        max_src_len=corpus.max_src_len + 9,
        max_trg_len=corpus.max_trg_len + 3,
    )
    p1 = model1.init(corpus)
    p2 = model1.init(wider)
    p1, s1 = model1.em_step(p1, corpus)
    p2, s2 = model1.em_step(p2, wider)
    np.testing.assert_allclose(float(s1["loglik"]), float(s2["loglik"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1.log_t), np.asarray(p2.log_t), atol=1e-5
    )
    a1 = np.asarray(model1.align(p1, corpus))
    a2 = np.asarray(model1.align(p2, wider))
    np.testing.assert_array_equal(a1, a2[:, : corpus.max_src_len])


def test_toy_corpus_fixed_point():
    # Two concepts, two phones, fully unambiguous: phone 1 always with
    # concept 1, phone 2 always with concept 2. EM must converge to the
    # deterministic table.
    src = [np.array([1]), np.array([2]), np.array([1, 2]), np.array([2, 1])]
    trg = [np.array([1]), np.array([2]), np.array([1, 2]), np.array([2, 1])]
    corpus = Corpus.from_ragged(src, trg, src_vocab=3, trg_vocab=3)
    params = model1.init(corpus)
    params, _ = model1.train(params, corpus, 30)
    t = np.exp(np.asarray(params.log_t))
    assert t[1, 1] > 0.95 and t[2, 2] > 0.95
    assert t[2, 1] < 0.05 and t[1, 2] < 0.05


def test_em_recovers_gold_alignment():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=200, seed=5)
    params = model1.init(corpus)
    params, _ = jax.jit(lambda p: model1.train(p, corpus, 15))(params)
    pred = np.asarray(model1.align(params, corpus))
    sm = np.asarray(corpus.src_mask())
    word_mask = sm & (gold.alignment > 0)  # score on non-NULL gold positions
    acc = (pred == gold.alignment)[word_mask].mean()
    assert acc > 0.85, acc


def test_align_concept_space_matches_dense_decode():
    """Round-3 decode: the concept-vocabulary-space argmax must equal the
    dense [N, Ts, 1+Tt] argmax on trained tables, on BOTH sides of the
    ``align`` shape dispatch (sparse Tt=4 and dense Tt>=16 targets)."""
    for gen in (
        dict(n_utterances=60, seed=11),
        dict(n_utterances=24, n_concepts=60, min_concepts=16,
             max_concepts=18, seed=11),
    ):
        corpus, _, _ = make_flickr8k_mini(**gen)
        params = model1.init(corpus)
        params, _ = jax.jit(lambda p: model1.train(p, corpus, 10))(params)
        fast = np.asarray(model1._align_concept_space(params, corpus))
        dense = np.asarray(model1._align_dense(params, corpus))
        np.testing.assert_array_equal(fast, dense)
        dispatched = np.asarray(model1.align(params, corpus))
        np.testing.assert_array_equal(dispatched, dense)


def test_loglik_matches_dense_formulation():
    """Sufficient-statistic loglik == materialized per-position logsumexp."""
    from multimodalworddiscovery_tpu.core.logsemiring import masked_logsumexp

    corpus, _, _ = make_flickr8k_mini(n_utterances=40, seed=12)
    params = model1.init(corpus)
    params, _ = jax.jit(lambda p: model1.train(p, corpus, 5))(params)

    logp, _ = model1._pair_logprobs(params, corpus)
    per_pos = masked_logsumexp(logp, axis=-1)
    prior = -jnp.log1p(corpus.trg_len.astype(logp.dtype))
    dense = float(
        jnp.sum(jnp.where(corpus.src_mask(), per_pos, 0.0))
        + jnp.sum(corpus.src_len.astype(logp.dtype) * prior)
    )
    fast = float(model1.loglik(params, corpus))
    np.testing.assert_allclose(fast, dense, rtol=1e-5)


def test_degenerate_table_counts_stay_finite():
    """ADVICE round-2: a phone whose total probability underflows to ~0 must
    contribute ZERO expected counts, not inf (h / r_safe overflow)."""
    corpus, _, _ = make_flickr8k_mini(n_utterances=20, seed=13)
    params = model1.init(corpus)
    # make phone 0 impossible under every concept
    params = params.replace(log_t=params.log_t.at[0, :].set(-1e30))
    counts, ll = jax.jit(model1.expected_counts)(params, corpus)
    assert np.isfinite(np.asarray(counts)).all()
    assert np.asarray(counts)[0].sum() == 0.0  # zero, not garbage
