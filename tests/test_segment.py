import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.segment import (
    boundaries_from_segments,
    segments_from_alignment,
    segments_to_host,
)
from multimodalworddiscovery_tpu.oracles.numpy_metrics import segments_from_alignment_np


def test_segments_recover_gold_from_gold_alignment():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=60, seed=0)
    segs, mask = segments_from_alignment(
        jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
    )
    host = segments_to_host(segs, mask)
    assert host == [[tuple(s) for s in u] for u in gold.segments]


def test_segments_match_numpy_oracle_on_predictions():
    rng = np.random.default_rng(1)
    corpus, gold, _ = make_flickr8k_mini(n_utterances=30, seed=1)
    # random plausible alignments (including NULLs and repeats)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    trg = np.asarray(corpus.trg)
    pred = np.zeros_like(gold.alignment)
    for i in range(corpus.n):
        pred[i, : sl[i]] = rng.integers(0, tl[i] + 1, size=sl[i])
    segs, mask = segments_from_alignment(jnp.asarray(pred), corpus.trg, corpus.src_len)
    host = segments_to_host(segs, mask)
    for i in range(corpus.n):
        want = segments_from_alignment_np(pred[i], trg[i], sl[i])
        assert host[i] == want, (i, host[i], want)


def test_segments_are_partition_of_nonnull():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=40, seed=2)
    segs, mask = segments_from_alignment(
        jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
    )
    segs = np.asarray(segs)
    mask = np.asarray(mask)
    sl = np.asarray(corpus.src_len)
    for i in range(corpus.n):
        covered = np.zeros(sl[i], dtype=int)
        for s in np.where(mask[i])[0]:
            st, en, c = segs[i, s]
            assert 0 <= st < en <= sl[i]
            assert c > 0
            covered[st:en] += 1
        assert covered.max(initial=0) <= 1  # segments never overlap
        # non-NULL positions exactly covered
        np.testing.assert_array_equal(covered > 0, gold.alignment[i, : sl[i]] > 0)


def test_boundaries_from_segments():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=10, seed=3)
    segs, mask = segments_from_alignment(
        jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
    )
    bounds = np.asarray(boundaries_from_segments(segs, mask, corpus.max_src_len))
    for i in range(corpus.n):
        want = sorted({b for s in gold.segments[i] for b in (s[0], s[1])})
        got = np.where(bounds[i])[0].tolist()
        assert got == want, (i, got, want)
