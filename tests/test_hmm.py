import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as sp_lse

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm, hmm_core
from multimodalworddiscovery_tpu.oracles.numpy_hmm import NumpyHMM


def _ragged(corpus):
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    return (
        [src[i, : sl[i]] for i in range(corpus.n)],
        [trg[i, : tl[i]] for i in range(corpus.n)],
    )


@pytest.fixture(scope="module")
def mini():
    corpus, gold, meta = make_flickr8k_mini(n_utterances=24, seed=3)
    return corpus, gold, meta


def test_forward_backward_consistency(mini):
    """logsumexp(alpha_t + beta_t) == logZ at every valid t."""
    corpus, _, _ = mini
    params = hmm.init(corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)
    ab = np.asarray(alphas + betas)  # [Ts, N, S]
    sl = np.asarray(corpus.src_len)
    logz = np.asarray(logz)
    for i in range(corpus.n):
        for t in range(sl[i]):
            np.testing.assert_allclose(
                sp_lse(ab[t, i]), logz[i], rtol=1e-4, err_msg=f"utt {i} t {t}"
            )


def test_forward_matches_oracle(mini):
    corpus, _, _ = mini
    src_seqs, trg_seqs = _ragged(corpus)
    oracle = NumpyHMM(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)
    params = hmm.init(corpus)
    got = float(hmm.loglik(params, corpus))
    np.testing.assert_allclose(got, oracle.loglik(), rtol=1e-4)


def test_em_matches_oracle(mini):
    corpus, _, _ = mini
    src_seqs, trg_seqs = _ragged(corpus)
    oracle = NumpyHMM(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)
    params = hmm.init(corpus)
    step = jax.jit(hmm.em_step)
    for it in range(3):
        oracle_ll = oracle.em_iteration()
        params, stats = step(params, corpus)
        np.testing.assert_allclose(float(stats["loglik"]), oracle_ll, rtol=1e-4, err_msg=f"iter {it}")
        np.testing.assert_allclose(
            np.asarray(params.log_emit, dtype=np.float64),
            oracle.log_emit,
            rtol=2e-3,
            atol=2e-3,
            err_msg=f"emit iter {it}",
        )
        np.testing.assert_allclose(
            np.asarray(params.log_jump, dtype=np.float64),
            oracle.log_jump,
            rtol=2e-3,
            atol=2e-3,
            err_msg=f"jump iter {it}",
        )


def test_viterbi_matches_oracle(mini):
    corpus, _, _ = mini
    src_seqs, trg_seqs = _ragged(corpus)
    oracle = NumpyHMM(src_seqs, trg_seqs, corpus.src_vocab, corpus.trg_vocab)
    oracle.train(3)
    params = hmm.init(corpus)
    params, _ = jax.jit(lambda p: hmm.train(p, corpus, 3))(params)
    ours = np.asarray(hmm.align(params, corpus))
    theirs = oracle.align()
    sl = np.asarray(corpus.src_len)
    mismatch = 0
    total = 0
    for i, a in enumerate(theirs):
        mismatch += int((ours[i, : sl[i]] != a).sum())
        total += sl[i]
    # float32 vs float64 can flip near-ties; demand 99% agreement
    assert mismatch / total < 0.01, (mismatch, total)


def test_em_monotone_loglik(mini):
    corpus, _, _ = mini
    params = hmm.init(corpus)
    _, lls = jax.jit(lambda p: hmm.train(p, corpus, 8))(params)
    lls = np.asarray(lls)
    assert np.all(np.diff(lls) > -1e-2), lls


def test_viterbi_score_leq_logz(mini):
    corpus, _, _ = mini
    params = hmm.init(corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    path = hmm_core.viterbi(log_init, log_trans, log_emit, corpus.src_len)
    # score the viterbi path by hand
    li = np.asarray(log_init)
    lt = np.asarray(log_trans)
    le = np.asarray(log_emit)
    p = np.asarray(path)
    sl = np.asarray(corpus.src_len)
    logz = np.asarray(logz)
    for i in range(corpus.n):
        score = li[i, p[i, 0]] + le[i, 0, p[i, 0]]
        for t in range(1, sl[i]):
            score += lt[i, p[i, t - 1], p[i, t]] + le[i, t, p[i, t]]
        assert score <= logz[i] + 1e-2, (i, score, logz[i])


def test_padding_invariance(mini):
    corpus, _, _ = mini
    src_seqs, trg_seqs = _ragged(corpus)
    wider = Corpus.from_ragged(
        src_seqs,
        trg_seqs,
        src_vocab=corpus.src_vocab,
        trg_vocab=corpus.trg_vocab,
        max_src_len=corpus.max_src_len + 7,
        max_trg_len=corpus.max_trg_len + 2,
    )
    p1 = hmm.init(corpus)
    p2 = hmm.init(wider)
    p1, s1 = hmm.em_step(p1, corpus)
    p2, s2 = hmm.em_step(p2, wider)
    np.testing.assert_allclose(float(s1["loglik"]), float(s2["loglik"]), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p1.log_emit), np.asarray(p2.log_emit), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(p1.log_jump), np.asarray(p2.log_jump), rtol=1e-3, atol=1e-3
    )
    a1 = np.asarray(hmm.align(p1, corpus))
    a2 = np.asarray(hmm.align(p2, wider))
    np.testing.assert_array_equal(a1, a2[:, : corpus.max_src_len])


def test_hmm_recovers_gold_alignment():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=200, seed=5)
    params = hmm.init(corpus)
    params, _ = jax.jit(lambda p: hmm.train(p, corpus, 15))(params)
    pred = np.asarray(hmm.align(params, corpus))
    sm = np.asarray(corpus.src_mask())
    word_mask = sm & (gold.alignment > 0)
    acc = (pred == gold.alignment)[word_mask].mean()
    # HMM with jump transitions should beat Model-1's 0.87-0.9 here
    assert acc > 0.85, acc


def test_forward_associative_matches_sequential(mini):
    corpus, _, _ = mini
    params = hmm.init(corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    a1, z1 = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    a2, z2 = hmm_core.forward_associative(log_init, log_trans, log_emit, corpus.src_len)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-4)
    # compare alphas only at valid (t, state) positions
    sl = np.asarray(corpus.src_len)
    smask = np.asarray(hmm_core.state_mask(corpus))
    a1, a2 = np.asarray(a1), np.asarray(a2)
    for i in range(0, corpus.n, 5):
        for t in range(sl[i]):
            np.testing.assert_allclose(
                a1[t, i][smask[i]], a2[t, i][smask[i]], rtol=1e-3, atol=1e-3,
                err_msg=f"utt {i} t {t}",
            )


@pytest.mark.parametrize("block", [4, 16, 64])
def test_forward_blocked_matches_sequential(mini, block):
    """forward_blocked (the MFU-lever candidate: MXU-dense per-block matrix
    products, sequential only across block boundaries) must match the scan
    forward for any block size, including blocks that don't divide Ts-1 and
    blocks longer than the sequence."""
    corpus, _, _ = mini
    params = hmm.init(corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    a1, z1 = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    a2, z2 = hmm_core.forward_blocked(
        log_init, log_trans, log_emit, corpus.src_len, block=block
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-4)
    sl = np.asarray(corpus.src_len)
    smask = np.asarray(hmm_core.state_mask(corpus))
    a1, a2 = np.asarray(a1), np.asarray(a2)
    for i in range(0, corpus.n, 7):
        for t in range(sl[i]):
            np.testing.assert_allclose(
                a1[t, i][smask[i]], a2[t, i][smask[i]], rtol=1e-3, atol=1e-3,
                err_msg=f"utt {i} t {t}",
            )


def test_viterbi_factored_matches_dense():
    """Factored-transition Viterbi (no [N,S,S] tensor, int8 backpointers)
    must reproduce the dense decoder's paths."""
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.models import hmm_core

    corpus, _, _ = make_flickr8k_mini(n_utterances=40, seed=17)
    params = hmm.init(corpus)
    for _ in range(5):
        params, _ = hmm.em_step(params, corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    dense = np.asarray(
        hmm_core.viterbi(log_init, log_trans, log_emit, corpus.src_len)
    )
    fact = np.asarray(
        hmm_core.viterbi_factored(
            log_init, base, rowz, colmask, log_emit, corpus.src_len
        )
    )
    mask = np.asarray(corpus.src_mask())
    # identical up to fp-tie argmax flips (should be none on this corpus)
    agree = (dense == fact)[mask].mean()
    assert agree > 0.999, agree
