"""Golden-value regression tests (SURVEY.md §4): the full train->align->
segment->evaluate loop on a frozen corpus must reproduce committed metrics.

Regenerate with scripts in the file header of tests/golden_metrics.json if a
deliberate algorithm change shifts them."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.eval.metrics import (
    alignment_prf,
    boundary_prf,
    cluster_purity,
    word_iou,
)
from multimodalworddiscovery_tpu.models import hmm, model1
from multimodalworddiscovery_tpu.segment import (
    boundaries_from_segments,
    segments_from_alignment,
)

GOLDEN = json.loads((Path(__file__).parent / "golden_metrics.json").read_text())


@pytest.mark.parametrize("name,mod,iters", [("model1", model1, 15), ("hmm", hmm, 12)])
def test_golden_metrics(name, mod, iters):
    corpus, gold, _ = make_flickr8k_mini(n_utterances=100, seed=42)
    p = mod.init(corpus)
    p, _ = jax.jit(lambda q: mod.train(q, corpus, iters))(p)
    al = mod.align(p, corpus)
    ga = jnp.asarray(gold.alignment)
    ps_, pm = segments_from_alignment(al, corpus.trg, corpus.src_len)
    gs, gm = segments_from_alignment(ga, corpus.trg, corpus.src_len)
    pb = boundaries_from_segments(ps_, pm, corpus.max_src_len)
    gb = boundaries_from_segments(gs, gm, corpus.max_src_len)
    got = {
        "alignment_f1": float(alignment_prf(al, ga, corpus.src_mask())["f1"]),
        "word_iou_f1": float(word_iou(ps_, pm, gs, gm)["f1"]),
        "boundary_f1": float(boundary_prf(pb, gb, tolerance=1)["f1"]),
        "purity": float(cluster_purity(ps_, pm, gs, gm, corpus.trg_vocab)),
    }
    for k, want in GOLDEN[name].items():
        # small float32 drift allowed; a real regression moves these a lot
        assert abs(got[k] - want) < 0.02, (name, k, got[k], want)


@pytest.mark.slow
def test_golden_dtw_coherence():
    """DTW cluster coherence of the GOLD segmentation on the frozen
    continuous corpus (pure data + metric determinism; SURVEY.md §3.5)."""
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.dtw import cluster_dtw_coherence

    corpus, gold, _ = make_flickr8k_mini(n_utterances=60, seed=42)
    fc, fg, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.05, seed=42)
    segs, mask = segments_from_alignment(
        jnp.asarray(fg.alignment), fc.trg, fc.src_len
    )
    coh = cluster_dtw_coherence(fc.src, segs, mask, max_seg_len=16)
    want = GOLDEN["dtw_gold_segments"]
    for k in ("within", "across", "ratio"):
        np.testing.assert_allclose(float(coh[k]), want[k], rtol=0.02, atol=1e-3)
