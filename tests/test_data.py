import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.io import load_corpus, save_corpus
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames


def test_flickr8k_mini_deterministic():
    c1, g1, m1 = make_flickr8k_mini(n_utterances=20, seed=7)
    c2, g2, m2 = make_flickr8k_mini(n_utterances=20, seed=7)
    np.testing.assert_array_equal(np.asarray(c1.src), np.asarray(c2.src))
    np.testing.assert_array_equal(g1.alignment, g2.alignment)
    assert m1.lexicon == m2.lexicon


def test_flickr8k_mini_gold_consistency():
    corpus, gold, meta = make_flickr8k_mini(n_utterances=50, seed=1)
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    src_len = np.asarray(corpus.src_len)
    trg_len = np.asarray(corpus.trg_len)
    for i in range(corpus.n):
        # Every aligned phone position points at a valid trg position.
        a = gold.alignment[i, : src_len[i]]
        assert a.min() >= 0 and a.max() <= trg_len[i]
        # Gold segments spell out the lexicon words.
        for s, e, c in gold.segments[i]:
            word = src[i, s:e].tolist()
            assert word == meta.lexicon[c]
            # and the segment's gold alignment points at concept c
            j = a[s] - 1
            assert trg[i, j] == c
        # Padding positions have NULL alignment.
        assert (gold.alignment[i, src_len[i]:] == 0).all()


def test_corpus_masks_and_padding():
    corpus, _, _ = make_flickr8k_mini(n_utterances=10, seed=2)
    sm = np.asarray(corpus.src_mask())
    assert sm.sum() == np.asarray(corpus.src_len).sum()
    padded = corpus.pad_to(16)
    assert padded.n == 16
    assert np.asarray(padded.src_len)[10:].sum() == 0


def test_corpus_roundtrip_disk(tmp_path):
    corpus, gold, _ = make_flickr8k_mini(n_utterances=12, seed=3)
    save_corpus(corpus, gold, tmp_path, "mini")
    loaded, gold2 = load_corpus(tmp_path, "mini")
    np.testing.assert_array_equal(np.asarray(loaded.src), np.asarray(corpus.src))
    np.testing.assert_array_equal(np.asarray(loaded.trg), np.asarray(corpus.trg))
    np.testing.assert_array_equal(gold2.alignment, gold.alignment)
    assert gold2.segments == [[tuple(s) for s in u] for u in gold.segments]


def test_phones_to_frames():
    corpus, gold, _ = make_flickr8k_mini(n_utterances=8, seed=4)
    fc, fg, means = phones_to_frames(corpus, gold, feat_dim=8, seed=4)
    assert fc.src.ndim == 3 and fc.src.shape[-1] == 8
    src_len = np.asarray(fc.src_len)
    for i in range(fc.n):
        a = fg.alignment[i, : src_len[i]]
        assert a.max() <= np.asarray(fc.trg_len)[i]
        # frame segments are within bounds and ordered
        prev_end = 0
        for s, e, c in fg.segments[i]:
            assert 0 <= s < e <= src_len[i]
            assert s >= prev_end
            prev_end = e


def test_flickr8k_mini_batches_match_monolithic():
    """Batched generation (shared lexicon + rng stream) must reproduce the
    monolithic corpus row for row, regardless of batch size — the invariant
    the full-scale out-of-core pipeline (scripts/run_pipeline_fullscale.py)
    relies on."""
    from multimodalworddiscovery_tpu.data.synthetic import (
        make_flickr8k_mini_batches,
    )

    ref_corpus, ref_gold, ref_meta = make_flickr8k_mini(n_utterances=50, seed=4)
    for bs in (7, 50):
        meta, s_max, batches = make_flickr8k_mini_batches(
            n_utterances=50, batch_size=bs, seed=4
        )
        assert meta.lexicon == ref_meta.lexicon
        assert s_max >= ref_corpus.max_src_len
        rows = 0
        for corpus, gold in batches:
            b = corpus.n
            assert corpus.max_src_len == s_max  # global shape every batch
            np.testing.assert_array_equal(
                np.asarray(corpus.src)[:, : ref_corpus.max_src_len],
                np.asarray(ref_corpus.src)[rows : rows + b],
            )
            np.testing.assert_array_equal(
                np.asarray(corpus.src)[:, ref_corpus.max_src_len:], 0
            )
            np.testing.assert_array_equal(
                np.asarray(corpus.src_len),
                np.asarray(ref_corpus.src_len)[rows : rows + b],
            )
            np.testing.assert_array_equal(
                np.asarray(corpus.trg)[:, : ref_corpus.max_trg_len],
                np.asarray(ref_corpus.trg)[rows : rows + b],
            )
            np.testing.assert_array_equal(
                gold.alignment[:, : ref_gold.alignment.shape[1]],
                ref_gold.alignment[rows : rows + b],
            )
            assert gold.segments == ref_gold.segments[rows : rows + b]
            rows += b
        assert rows == 50


def test_phones_to_waveforms_batched_matches_scalar():
    """The template-vectorized synthesizer is bit-identical to the scalar
    per-token renderer at noise=0 (same formant draws, same float ops), and
    honors pad_phones for ShardWriter's fixed-shape batches."""
    from multimodalworddiscovery_tpu.data.synthetic import (
        phones_to_waveforms,
        phones_to_waveforms_batched,
    )

    corpus, gold, _ = make_flickr8k_mini(n_utterances=12, seed=3)
    ref_wavs, ref_lens, _ = phones_to_waveforms(corpus, gold, noise=0.0, seed=5)
    wavs, lens = phones_to_waveforms_batched(corpus, noise=0.0, seed=5)
    np.testing.assert_array_equal(lens, ref_lens)
    np.testing.assert_array_equal(wavs, ref_wavs)

    spp = 16000 * 80 // 1000
    padded, lens2 = phones_to_waveforms_batched(
        corpus, noise=0.0, seed=5, pad_phones=30
    )
    assert padded.shape == (12, 30 * spp)
    np.testing.assert_array_equal(lens2, ref_lens)
    np.testing.assert_array_equal(padded[:, : wavs.shape[1]], wavs)
    np.testing.assert_array_equal(padded[:, wavs.shape[1]:], 0.0)

    noisy, _ = phones_to_waveforms_batched(corpus, noise=0.02, seed=5)
    valid = np.arange(noisy.shape[1])[None, :] < lens[:, None]
    assert (noisy[~valid] == 0).all()  # noise never leaks past wav_len
    assert not np.array_equal(noisy, wavs)
