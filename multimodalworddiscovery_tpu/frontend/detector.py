"""Learned region-proposal detector: anchor-based RPN over conv features.

Reference counterpart: the reference's image preprocessing feeds RCNN-style
region boxes into the VGG16 region-embedding path (SURVEY.md §2 C3, §3.4 —
"boxes from dataset annotations and/or an RCNN detector").  The annotation
path lives in ``data/flickr30k_entities.py``; this module is the LEARNED
path: a single-stage region-proposal network that predicts boxes directly
from images, whose proposals feed ``image.region_embeddings`` exactly like
annotation boxes do.

TPU-first design:
- Everything on the compute path is jittable and static-shape: a fixed
  anchor grid computed at trace time, ``lax.top_k`` pre-NMS pruning to K
  candidates, and greedy NMS as a ``lax.fori_loop`` over a precomputed
  [K, K] IoU matrix (one O(K^2) VPU pass — no dynamic shapes, no
  data-dependent Python control flow).
- Anchor matching for training is one [A, G] IoU matrix per image (vmapped
  over the batch), with padded gold boxes + mask — the per-anchor label /
  matched-box gather is pure array work, so the whole train step is a single
  jitted function XLA can fuse.
- Boxes are normalized (y1, x1, y2, x2) in [0, 1] throughout, matching
  ``image.crop_and_resize``.

Float64 NumPy oracle: ``oracles/numpy_detector.py`` (IoU / decode / greedy
NMS parity pinned by tests/test_detector.py).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# clamp on predicted log-size deltas: exp(4) ~ 55x an anchor's size, beyond
# which a decoded box is degenerate anyway; keeps exp() finite early in
# training when the head is random
_MAX_DSIZE = 4.0


# ---------------------------------------------------------------------------
# anchors + box geometry
# ---------------------------------------------------------------------------


def anchor_grid(
    feat_h: int,
    feat_w: int,
    scales: tuple[float, ...] = (0.15, 0.3, 0.5),
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """Fixed anchor grid in normalized coordinates.

    One anchor per (cell, scale, ratio): centers at the cell centers of an
    (feat_h, feat_w) feature map; a scale ``s`` with aspect ``r`` spans
    height s*sqrt(r), width s/sqrt(r) of the image.  Returns
    [feat_h * feat_w * len(scales) * len(ratios), 4] float32
    (y1, x1, y2, x2) — a host-side constant baked into the jitted programs.
    """
    cy = (np.arange(feat_h) + 0.5) / feat_h
    cx = (np.arange(feat_w) + 0.5) / feat_w
    hs, ws = [], []
    for s in scales:
        for r in ratios:
            hs.append(s * np.sqrt(r))
            ws.append(s / np.sqrt(r))
    hs = np.asarray(hs, np.float32)  # [A]
    ws = np.asarray(ws, np.float32)
    cyg, cxg = np.meshgrid(cy, cx, indexing="ij")  # [H, W]
    cyg = cyg[:, :, None]
    cxg = cxg[:, :, None]
    boxes = np.stack(
        [cyg - hs / 2, cxg - ws / 2, cyg + hs / 2, cxg + ws / 2], axis=-1
    )  # [H, W, A, 4]
    return boxes.reshape(-1, 4).astype(np.float32)


def _center_form(boxes: jax.Array) -> tuple[jax.Array, ...]:
    y1, x1, y2, x2 = jnp.moveaxis(boxes, -1, 0)
    return (y1 + y2) / 2, (x1 + x2) / 2, y2 - y1, x2 - x1


def decode_boxes(anchors: jax.Array, deltas: jax.Array) -> jax.Array:
    """(dy, dx, dh, dw) deltas w.r.t. anchors -> (y1, x1, y2, x2) in [0, 1].

    Standard RCNN parameterization: center shifts are in units of the anchor
    size; sizes are log-scaled.  Broadcasts: anchors [..., A, 4],
    deltas [..., A, 4].
    """
    acy, acx, ah, aw = _center_form(anchors)
    dy, dx, dh, dw = jnp.moveaxis(deltas, -1, 0)
    cy = acy + dy * ah
    cx = acx + dx * aw
    h = ah * jnp.exp(jnp.clip(dh, -_MAX_DSIZE, _MAX_DSIZE))
    w = aw * jnp.exp(jnp.clip(dw, -_MAX_DSIZE, _MAX_DSIZE))
    out = jnp.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=-1)
    return jnp.clip(out, 0.0, 1.0)


def encode_boxes(anchors: jax.Array, gt: jax.Array) -> jax.Array:
    """Inverse of ``decode_boxes`` (regression targets for matched anchors)."""
    acy, acx, ah, aw = _center_form(anchors)
    gcy, gcx, gh, gw = _center_form(gt)
    eps = 1e-8
    return jnp.stack(
        [
            (gcy - acy) / (ah + eps),
            (gcx - acx) / (aw + eps),
            jnp.log((gh + eps) / (ah + eps)),
            jnp.log((gw + eps) / (aw + eps)),
        ],
        axis=-1,
    )


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU: a [Na, 4], b [Nb, 4] -> [Na, Nb]."""
    ay1, ax1, ay2, ax2 = jnp.moveaxis(a[:, None, :], -1, 0)
    by1, bx1, by2, bx2 = jnp.moveaxis(b[None, :, :], -1, 0)
    ih = jnp.maximum(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    iw = jnp.maximum(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    inter = ih * iw
    area_a = jnp.maximum(ay2 - ay1, 0.0) * jnp.maximum(ax2 - ax1, 0.0)
    area_b = jnp.maximum(by2 - by1, 0.0) * jnp.maximum(bx2 - bx1, 0.0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-12)


def nms(
    boxes: jax.Array,
    scores: jax.Array,
    k: int,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape greedy NMS for one image.

    boxes [A, 4], scores [A] -> (boxes [k, 4], scores [k], keep [k]) where
    ``keep`` marks survivors.  ``lax.top_k`` prunes to the k best candidates
    (score-descending, which is exactly greedy-NMS visitation order), then a
    ``fori_loop`` walks the precomputed [k, k] IoU matrix suppressing lower
    ranked overlaps — no dynamic shapes, compiles once for any corpus.
    """
    vals, idx = jax.lax.top_k(scores, k)
    cand = boxes[idx]  # [k, 4]
    iou = box_iou(cand, cand)
    ranks = jnp.arange(k)

    def body(i, keep):
        sup = (iou[i] > iou_thresh) & (ranks > i) & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, k, body, vals > score_thresh)
    return cand, vals, keep


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class ConvBackbone(nn.Module):
    """Small strided conv stack: [N, H, W, 3] -> [N, H/2^d, W/2^d, widths[-1]].

    The standalone backbone for training a detector from scratch (the VGG16
    conv stack is the alternative input — see ``vgg_features``)."""

    widths: tuple[int, ...] = (32, 64, 128)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i, w in enumerate(self.widths):
            x = nn.Conv(w, (3, 3), strides=(2, 2), padding=1, name=f"conv_{i}")(x)
            x = nn.relu(x)
        return x


class RPNHead(nn.Module):
    """Feature map [N, fh, fw, C] -> (objectness [N, A_tot], deltas
    [N, A_tot, 4]) with A_tot = fh * fw * num_anchors."""

    num_anchors: int
    channels: int = 128

    @nn.compact
    def __call__(self, feat: jax.Array) -> tuple[jax.Array, jax.Array]:
        n = feat.shape[0]
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1, name="trunk")(feat))
        obj = nn.Conv(self.num_anchors, (1, 1), name="objectness")(x)
        deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="deltas")(x)
        return obj.reshape(n, -1), deltas.reshape(n, -1, 4)


class Detector(nn.Module):
    """Backbone + RPN head; images [N, H, W, 3] -> (obj, deltas)."""

    num_anchors: int
    widths: tuple[int, ...] = (32, 64, 128)
    channels: int = 128

    @nn.compact
    def __call__(self, images: jax.Array) -> tuple[jax.Array, jax.Array]:
        feat = ConvBackbone(self.widths, name="backbone")(images)
        return RPNHead(self.num_anchors, self.channels, name="rpn")(feat)


class DetectorConfig(NamedTuple):
    """Static geometry shared by init / train / propose."""

    image_size: int
    scales: tuple[float, ...] = (0.15, 0.3, 0.5)
    ratios: tuple[float, ...] = (0.5, 1.0, 2.0)
    widths: tuple[int, ...] = (32, 64, 128)
    channels: int = 128

    @property
    def feat_size(self) -> int:
        return self.image_size // (2 ** len(self.widths))

    @property
    def num_anchors(self) -> int:
        return len(self.scales) * len(self.ratios)

    def anchors(self) -> np.ndarray:
        return anchor_grid(self.feat_size, self.feat_size, self.scales, self.ratios)

    def module(self) -> Detector:
        return Detector(self.num_anchors, self.widths, self.channels)


def init(config: DetectorConfig, key: jax.Array | None = None):
    """Random-init detector variables for ``config``."""
    if key is None:
        key = jax.random.PRNGKey(0)
    mod = config.module()
    variables = mod.init(
        key, jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
    )
    return mod, variables


# ---------------------------------------------------------------------------
# training (anchor matching + one jitted step)
# ---------------------------------------------------------------------------


def match_anchors(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_mask: jax.Array,
    pos_iou: float = 0.5,
    neg_iou: float = 0.3,
) -> tuple[jax.Array, jax.Array]:
    """Per-anchor training labels for ONE image.

    anchors [A, 4]; gt_boxes [G, 4] padded; gt_mask [G] bool.
    Returns (labels [A] in {1 pos, 0 neg, -1 ignore}, matched [A] gt index).
    Positives: IoU >= pos_iou with some valid gt, plus the best anchor of
    every valid gt (force-match, so no gt goes unsupervised); negatives:
    best IoU < neg_iou; the band between is ignored.
    """
    iou = box_iou(anchors, gt_boxes)  # [A, G]
    iou = jnp.where(gt_mask[None, :], iou, -1.0)
    best_iou = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1)
    labels = jnp.where(
        best_iou >= pos_iou, 1, jnp.where(best_iou < neg_iou, 0, -1)
    )
    # force-match the best anchor of each valid gt (scatter; duplicate
    # collisions resolve to one of the gts, which is fine)
    a = anchors.shape[0]
    g = gt_boxes.shape[0]
    best_anchor = jnp.argmax(iou, axis=0)  # [G]
    force = (
        jnp.zeros((a,), bool).at[best_anchor].max(gt_mask)
    )
    forced_gt = (
        jnp.zeros((a,), jnp.int32)
        .at[best_anchor]
        .max(jnp.where(gt_mask, jnp.arange(g, dtype=jnp.int32), 0))
    )
    labels = jnp.where(force, 1, labels)
    matched = jnp.where(force, forced_gt, matched).astype(jnp.int32)
    return labels, matched


def loss_fn(
    mod: Detector,
    variables: Any,
    anchors: jax.Array,
    images: jax.Array,
    gt_boxes: jax.Array,
    gt_mask: jax.Array,
    pos_iou: float = 0.5,
    neg_iou: float = 0.3,
    box_weight: float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Sigmoid-BCE objectness + Huber box regression over a batch."""
    obj, deltas = mod.apply(variables, images)  # [N, A], [N, A, 4]
    labels, matched = jax.vmap(
        functools.partial(match_anchors, anchors, pos_iou=pos_iou, neg_iou=neg_iou)
    )(gt_boxes, gt_mask)  # [N, A], [N, A]
    pos = labels == 1
    valid = labels >= 0
    tgt = (labels == 1).astype(obj.dtype)
    bce = jnp.maximum(obj, 0) - obj * tgt + jnp.log1p(jnp.exp(-jnp.abs(obj)))
    obj_loss = jnp.sum(jnp.where(valid, bce, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )
    matched_boxes = jnp.take_along_axis(
        gt_boxes, matched[..., None], axis=1
    )  # [N, A, 4]
    tdeltas = encode_boxes(anchors[None], matched_boxes)
    diff = deltas - tdeltas
    huber = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff**2, jnp.abs(diff) - 0.5)
    box_loss = jnp.sum(jnp.where(pos[..., None], huber, 0.0)) / jnp.maximum(
        jnp.sum(pos), 1
    )
    loss = obj_loss + box_weight * box_loss
    return loss, {
        "loss": loss,
        "obj_loss": obj_loss,
        "box_loss": box_loss,
        "n_pos": jnp.sum(pos),
    }


def make_train_step(mod: Detector, anchors: jax.Array, optimizer):
    """Jitted (variables, opt_state, images, gt, mask) -> updated + stats."""
    import optax

    @jax.jit
    def step(variables, opt_state, images, gt_boxes, gt_mask):
        grad_fn = jax.value_and_grad(
            lambda v: loss_fn(mod, v, anchors, images, gt_boxes, gt_mask),
            has_aux=True,
        )
        (_, stats), grads = grad_fn(variables)
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return variables, opt_state, stats

    return step


def train(
    config: DetectorConfig,
    images: jax.Array,
    gt_boxes: jax.Array,
    gt_mask: jax.Array,
    num_steps: int = 300,
    learning_rate: float = 1e-3,
    key: jax.Array | None = None,
):
    """Train a detector on (images, padded gt boxes, mask); returns
    (mod, variables, stats_history)."""
    import optax

    mod, variables = init(config, key)
    anchors = jnp.asarray(config.anchors())
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(variables)
    step = make_train_step(mod, anchors, optimizer)
    history = []
    for it in range(num_steps):
        variables, opt_state, stats = step(
            variables, opt_state, images, gt_boxes, gt_mask
        )
        if (it + 1) % 50 == 0 or it == num_steps - 1:
            history.append({k: float(v) for k, v in stats.items()})
    return mod, variables, history


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("mod", "k", "iou_thresh", "score_thresh")
)
def propose(
    mod: Detector,
    variables: Any,
    anchors: jax.Array,
    images: jax.Array,
    k: int = 16,
    iou_thresh: float = 0.5,
    score_thresh: float = 0.5,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Images [N, H, W, 3] -> (boxes [N, k, 4], scores [N, k], keep [N, k]).

    The learned replacement for annotation boxes: ``boxes[i][keep[i]]`` feeds
    ``image.region_embeddings`` exactly like ``data/flickr30k_entities``
    boxes do (same normalized (y1, x1, y2, x2) convention).
    """
    obj, deltas = mod.apply(variables, images)
    boxes = decode_boxes(anchors[None], deltas)
    scores = jax.nn.sigmoid(obj)
    return jax.vmap(
        functools.partial(
            nms, k=k, iou_thresh=iou_thresh, score_thresh=score_thresh
        )
    )(boxes, scores)


def detection_recall(
    pred_boxes: np.ndarray,
    pred_keep: np.ndarray,
    gt_boxes: np.ndarray,
    gt_mask: np.ndarray,
    iou_thresh: float = 0.5,
) -> float:
    """Fraction of valid gt boxes covered by some kept proposal (host-side
    eval helper for tests/benchmarks)."""
    from multimodalworddiscovery_tpu.oracles.numpy_detector import iou_matrix

    hit = 0
    total = 0
    for i in range(len(gt_boxes)):
        gt = gt_boxes[i][gt_mask[i].astype(bool)]
        kept = pred_boxes[i][pred_keep[i].astype(bool)]
        total += len(gt)
        if len(gt) == 0 or len(kept) == 0:
            continue
        m = iou_matrix(kept, gt)
        hit += int(np.sum(np.max(m, axis=0) >= iou_thresh))
    return hit / max(total, 1)
