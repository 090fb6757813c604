"""Learned region-proposal detector (frontend/detector.py, SURVEY.md §2 C3).

Geometry parity vs the float64 NumPy oracle (oracles/numpy_detector.py),
anchor-matching invariants, and an end-to-end training smoke: proposals from
a detector trained on the synthetic boxes corpus must recover most gold
boxes at IoU 0.5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data.synthetic import make_boxes_mini
from multimodalworddiscovery_tpu.frontend import detector
from multimodalworddiscovery_tpu.oracles import numpy_detector as oracle


def _random_boxes(rng, n):
    y1 = rng.uniform(0, 0.8, n)
    x1 = rng.uniform(0, 0.8, n)
    h = rng.uniform(0.05, 0.5, n)
    w = rng.uniform(0.05, 0.5, n)
    return np.stack([y1, x1, np.minimum(y1 + h, 1), np.minimum(x1 + w, 1)], -1).astype(
        np.float32
    )


def test_iou_matches_oracle():
    rng = np.random.default_rng(0)
    a = _random_boxes(rng, 17)
    b = _random_boxes(rng, 9)
    got = np.asarray(detector.box_iou(jnp.asarray(a), jnp.asarray(b)))
    want = oracle.iou_matrix(a, b)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_decode_roundtrip_and_oracle_parity():
    rng = np.random.default_rng(1)
    anchors = detector.anchor_grid(4, 4, scales=(0.2, 0.4), ratios=(1.0,))
    gt = _random_boxes(rng, len(anchors))
    enc = detector.encode_boxes(jnp.asarray(anchors), jnp.asarray(gt))
    dec = detector.decode_boxes(jnp.asarray(anchors), enc)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-4)
    deltas = rng.normal(size=anchors.shape).astype(np.float32)
    got = np.asarray(detector.decode_boxes(jnp.asarray(anchors), jnp.asarray(deltas)))
    want = oracle.decode_boxes(anchors, deltas)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_matches_oracle():
    rng = np.random.default_rng(2)
    boxes = _random_boxes(rng, 40)
    # strictly distinct scores so greedy visitation order is unambiguous
    scores = (np.arange(40) * 0.013 + rng.uniform(0, 0.005, 40)).astype(np.float32)
    rng.shuffle(scores)
    k = 40
    cand, vals, keep = detector.nms(
        jnp.asarray(boxes), jnp.asarray(scores), k=k, iou_thresh=0.4
    )
    got = sorted(
        map(tuple, np.asarray(cand)[np.asarray(keep)].round(5).tolist())
    )
    kept_idx = oracle.greedy_nms(boxes, scores, iou_thresh=0.4)
    want = sorted(map(tuple, boxes[kept_idx].round(5).tolist()))
    assert got == want


def test_nms_respects_score_threshold():
    boxes = jnp.asarray([[0.0, 0.0, 0.2, 0.2], [0.5, 0.5, 0.9, 0.9]], jnp.float32)
    scores = jnp.asarray([0.9, 0.1], jnp.float32)
    _, _, keep = detector.nms(boxes, scores, k=2, score_thresh=0.5)
    assert np.asarray(keep).tolist() == [True, False]


def test_match_anchors_invariants():
    rng = np.random.default_rng(3)
    anchors = jnp.asarray(detector.anchor_grid(6, 6))
    gt = jnp.asarray(_random_boxes(rng, 3))
    mask = jnp.asarray([True, True, False])
    labels, matched = detector.match_anchors(anchors, gt, mask)
    labels = np.asarray(labels)
    matched = np.asarray(matched)
    # every VALID gt is force-matched to at least one positive anchor
    pos_gt = set(matched[labels == 1].tolist())
    assert {0, 1} <= pos_gt
    # no positive matched to the invalid (padded) gt
    assert 2 not in pos_gt
    # negatives genuinely have low IoU with every valid gt
    iou = np.asarray(detector.box_iou(anchors, gt))[:, :2]
    assert np.all(iou[labels == 0].max(axis=1) < 0.5)


def test_anchor_grid_geometry():
    g = detector.anchor_grid(4, 4, scales=(0.25,), ratios=(1.0,))
    assert g.shape == (16, 4)
    # all centered inside the image, size == scale
    cy = (g[:, 0] + g[:, 2]) / 2
    np.testing.assert_allclose(np.unique(cy.round(6)), (np.arange(4) + 0.5) / 4)
    np.testing.assert_allclose(g[:, 2] - g[:, 0], 0.25, atol=1e-6)


@pytest.mark.slow  # 150-step training-quality run; geometry/oracle parity above
def test_train_detector_recovers_boxes():
    cfg = detector.DetectorConfig(
        image_size=48, scales=(0.2, 0.35), ratios=(0.7, 1.4),
        widths=(16, 32, 64), channels=64,
    )
    images, boxes, mask = make_boxes_mini(n_images=48, image_size=48, seed=0)
    mod, variables, hist = detector.train(
        cfg, jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(mask),
        num_steps=150, learning_rate=2e-3, key=jax.random.PRNGKey(0),
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    anchors = jnp.asarray(cfg.anchors())
    pb, ps, pk = detector.propose(mod, variables, anchors, jnp.asarray(images), k=8)
    rec = detector.detection_recall(np.asarray(pb), np.asarray(pk), boxes, mask)
    assert rec >= 0.7, rec
    # proposals feed the region-embedding path exactly like annotation boxes
    from multimodalworddiscovery_tpu.frontend import image as image_frontend

    crops = image_frontend.crop_and_resize(
        jnp.asarray(images[0]), pb[0], size=16
    )
    assert crops.shape == (8, 16, 16, 3)
    assert np.isfinite(np.asarray(crops)).all()


def test_images_for_corpus_invariants():
    """Rendered paired images (data.synthetic.images_for_corpus): one box per
    target concept, normalized coords, shuffled slot order tracked by pos."""
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.synthetic import (
        concept_palette,
        images_for_corpus,
    )

    corpus, _, _ = make_flickr8k_mini(
        n_utterances=12, n_concepts=8, min_concepts=2, max_concepts=4, seed=3
    )
    images, boxes, mask, pos = images_for_corpus(corpus, image_size=32, seed=3)
    n, g = mask.shape
    assert images.shape == (12, 32, 32, 3) and boxes.shape == (n, g, 4)
    assert images.min() >= 0.0 and images.max() <= 1.0
    tl = np.asarray(corpus.trg_len)
    np.testing.assert_array_equal(mask.sum(axis=1), tl)
    for i in range(n):
        k = int(tl[i])
        # pos is a permutation of 1..k on real slots, 0 on padding
        assert sorted(pos[i, :k].tolist()) == list(range(1, k + 1))
        assert (pos[i, k:] == 0).all()
        b = boxes[i, :k]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()
        assert b.min() >= 0.0 and b.max() <= 1.0
    # determinism
    images2, _, _, _ = images_for_corpus(corpus, image_size=32, seed=3)
    np.testing.assert_array_equal(images, images2)
    # palette: index 0 black, concept colors pairwise distinct
    pal = concept_palette(8)
    assert (pal[0] == 0).all()
    d = np.linalg.norm(pal[1:, None] - pal[None, 1:], axis=-1)
    assert (d + np.eye(8)).min() > 0.05
