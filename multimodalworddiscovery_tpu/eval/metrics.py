"""On-device alignment / segmentation metrics.

Reference counterpart: ``utils/clusteval.py`` + eval scripts (SURVEY.md §2
C11) — per-utterance Python loops over boundary sets and IoU matrices.  Here
every metric is a fixed-shape masked jnp computation over the whole corpus;
only the final scalars leave the device (BASELINE.json: "no NumPy
round-trips").

Conventions:
  alignment arrays [N, Ts]: 0 = NULL, j >= 1 = 1-based trg position.
  segment arrays   [N, S, 3]: (start, end_exclusive, concept_id) + bool mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _safe_div(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.where(b > 0, a / jnp.maximum(b, 1), 0.0)


def _prf(tp: jax.Array, n_pred: jax.Array, n_gold: jax.Array) -> dict[str, jax.Array]:
    p = _safe_div(tp, n_pred)
    r = _safe_div(tp, n_gold)
    f1 = jnp.where(p + r > 0, 2 * p * r / jnp.maximum(p + r, 1e-12), 0.0)
    return {"precision": p, "recall": r, "f1": f1}


def alignment_stats(
    pred: jax.Array, gold: jax.Array, src_mask: jax.Array
) -> dict[str, jax.Array]:
    """Additive sufficient statistics of ``alignment_prf`` — summable across
    corpus shards (streamed evaluation)."""
    pred = jnp.where(src_mask, pred, 0)
    gold = jnp.where(src_mask, gold, 0)
    return {
        "tp": jnp.sum((pred == gold) & (gold > 0) & (pred > 0)).astype(jnp.float32),
        "n_pred": jnp.sum(pred > 0).astype(jnp.float32),
        "n_gold": jnp.sum(gold > 0).astype(jnp.float32),
    }


def alignment_from_stats(s: dict[str, jax.Array]) -> dict[str, jax.Array]:
    out = _prf(s["tp"], s["n_pred"], s["n_gold"])
    out["aer"] = 1.0 - _safe_div(2.0 * s["tp"], s["n_pred"] + s["n_gold"])
    return out


@jax.jit
def alignment_prf(
    pred: jax.Array, gold: jax.Array, src_mask: jax.Array
) -> dict[str, jax.Array]:
    """Alignment-link precision/recall/F1 (+ alignment error rate).

    A link is a (source position, target position) pair with target != NULL.
    Since an alignment assigns at most one target per source position, the
    set-intersection reduces to positionwise equality on non-NULL entries.
    """
    return alignment_from_stats(alignment_stats(pred, gold, src_mask))


def _segment_iou_matrix(
    pred_segs: jax.Array, pred_mask: jax.Array, gold_segs: jax.Array, gold_mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Pairwise interval IoU [N, Sp, Sg] + joint validity mask."""
    ps, pe = pred_segs[..., 0], pred_segs[..., 1]  # [N, Sp]
    gs, ge = gold_segs[..., 0], gold_segs[..., 1]  # [N, Sg]
    inter = jnp.maximum(
        0,
        jnp.minimum(pe[:, :, None], ge[:, None, :])
        - jnp.maximum(ps[:, :, None], gs[:, None, :]),
    ).astype(jnp.float32)
    len_p = (pe - ps)[:, :, None]
    len_g = (ge - gs)[:, None, :]
    union = (len_p + len_g).astype(jnp.float32) - inter
    iou = _safe_div(inter, union)
    mask = pred_mask[:, :, None] & gold_mask[:, None, :]
    return jnp.where(mask, iou, 0.0), mask


def word_iou_stats(
    pred_segs: jax.Array,
    pred_mask: jax.Array,
    gold_segs: jax.Array,
    gold_mask: jax.Array,
    iou_threshold: float = 0.5,
) -> dict[str, jax.Array]:
    """Additive sufficient statistics of ``word_iou`` (matching is
    per-utterance, so every count sums across shards)."""
    iou, mask = _segment_iou_matrix(pred_segs, pred_mask, gold_segs, gold_mask)
    same = (pred_segs[..., 2][:, :, None] == gold_segs[..., 2][:, None, :]) & mask
    iou_c = jnp.where(same, iou, 0.0)
    best_per_gold = jnp.max(iou_c, axis=1)  # [N, Sg]
    best_per_pred = jnp.max(iou_c, axis=2)  # [N, Sp]
    f32 = jnp.float32
    return {
        "sum_best_iou": jnp.sum(jnp.where(gold_mask, best_per_gold, 0.0)).astype(f32),
        "hit_gold": jnp.sum((best_per_gold >= iou_threshold) & gold_mask).astype(f32),
        "hit_pred": jnp.sum((best_per_pred >= iou_threshold) & pred_mask).astype(f32),
        "n_gold": jnp.sum(gold_mask).astype(f32),
        "n_pred": jnp.sum(pred_mask).astype(f32),
    }


def word_iou_from_stats(s: dict[str, jax.Array]) -> dict[str, jax.Array]:
    p = _safe_div(s["hit_pred"], s["n_pred"])
    r = _safe_div(s["hit_gold"], s["n_gold"])
    f1 = jnp.where(p + r > 0, 2 * p * r / jnp.maximum(p + r, 1e-12), 0.0)
    return {
        "mean_iou": _safe_div(s["sum_best_iou"], s["n_gold"]),
        "precision": p,
        "recall": r,
        "f1": f1,
    }


@jax.jit
def word_iou(
    pred_segs: jax.Array,
    pred_mask: jax.Array,
    gold_segs: jax.Array,
    gold_mask: jax.Array,
    iou_threshold: float = 0.5,
) -> dict[str, jax.Array]:
    """Word IoU + word-discovery P/R/F1 at an IoU threshold.

    mean_iou: for each gold word unit, the best IoU among predicted units
    with the SAME concept label, averaged over gold units.  word P/R/F1:
    a unit "matches" if same-concept IoU >= threshold (greedy, both sides).
    """
    return word_iou_from_stats(
        word_iou_stats(pred_segs, pred_mask, gold_segs, gold_mask, iou_threshold)
    )


def boundary_stats(
    pred_bounds: jax.Array, gold_bounds: jax.Array, tolerance: int = 0
) -> dict[str, jax.Array]:
    """Additive sufficient statistics of ``boundary_prf`` (matching is
    within-utterance; counts sum across shards).  [N, L+1] bools."""
    def shift(b: jax.Array, d: int) -> jax.Array:
        # zero-padded shift along positions (jnp.roll would wrap around and
        # let a boundary at L match one at 0)
        if d > 0:
            return jnp.pad(b, ((0, 0), (d, 0)))[:, :-d]
        return jnp.pad(b, ((0, 0), (0, -d)))[:, -d:]

    def dilate(b: jax.Array) -> jax.Array:
        out = b
        for d in range(1, tolerance + 1):
            out = out | shift(b, d) | shift(b, -d)
        return out

    gold_d = dilate(gold_bounds)
    pred_d = dilate(pred_bounds)
    return {
        "tp_p": jnp.sum(pred_bounds & gold_d).astype(jnp.float32),
        "tp_g": jnp.sum(gold_bounds & pred_d).astype(jnp.float32),
        "n_pred": jnp.sum(pred_bounds).astype(jnp.float32),
        "n_gold": jnp.sum(gold_bounds).astype(jnp.float32),
    }


def boundary_from_stats(s: dict[str, jax.Array]) -> dict[str, jax.Array]:
    p = _safe_div(s["tp_p"], s["n_pred"])
    r = _safe_div(s["tp_g"], s["n_gold"])
    f1 = jnp.where(p + r > 0, 2 * p * r / jnp.maximum(p + r, 1e-12), 0.0)
    return {"precision": p, "recall": r, "f1": f1}


@functools.partial(jax.jit, static_argnames=("tolerance",))
def boundary_prf(
    pred_bounds: jax.Array, gold_bounds: jax.Array, tolerance: int = 0
) -> dict[str, jax.Array]:
    """Boundary precision/recall/F1 with +-tolerance positions.

    Relaxed matching via dilation: a predicted boundary counts if any gold
    boundary lies within ``tolerance``; recall symmetric.
    """
    return boundary_from_stats(boundary_stats(pred_bounds, gold_bounds, tolerance))


def cluster_purity(
    pred_segs: jax.Array,
    pred_mask: jax.Array,
    gold_segs: jax.Array,
    gold_mask: jax.Array,
    n_concepts: int,
) -> jax.Array:
    """Cluster purity of discovered word units (reference clusteval.py).

    Each predicted unit belongs to the cluster of its concept label; its gold
    class is the concept of the max-overlap gold unit (0 if none).  Purity =
    sum over clusters of the dominant gold class count / total units.
    """
    return purity_from_counts(
        purity_counts(pred_segs, pred_mask, gold_segs, gold_mask, n_concepts)
    )


def purity_from_counts(counts: jax.Array) -> jax.Array:
    """Purity from a (cluster, gold-class) contingency matrix — counts are
    additive across shards."""
    total = jnp.sum(counts)
    return _safe_div(jnp.sum(jnp.max(counts, axis=1)), total)


def cluster_nmi(
    pred_segs: jax.Array,
    pred_mask: jax.Array,
    gold_segs: jax.Array,
    gold_mask: jax.Array,
    n_concepts: int,
) -> jax.Array:
    """Normalized mutual information between discovered clusters and gold
    classes: 2·I(C;G) / (H(C)+H(G)), from the same (cluster, gold-class)
    contingency matrix as purity — so it streams/sums across shards too.
    Complements purity (which a degenerate one-unit-per-cluster solution
    can game; NMI penalizes it)."""
    return nmi_from_counts(
        purity_counts(pred_segs, pred_mask, gold_segs, gold_mask, n_concepts)
    )


def nmi_from_counts(counts: jax.Array) -> jax.Array:
    total = jnp.maximum(jnp.sum(counts), 1.0)
    p = counts / total  # joint
    pc = jnp.sum(p, axis=1, keepdims=True)  # cluster marginal
    pg = jnp.sum(p, axis=0, keepdims=True)  # gold-class marginal

    def xlogy(x, y):
        return jnp.where(x > 0, x * jnp.log(jnp.maximum(y, 1e-30)), 0.0)

    mi = jnp.sum(xlogy(p, p / jnp.maximum(pc * pg, 1e-30)))
    hc = -jnp.sum(xlogy(pc, pc))
    hg = -jnp.sum(xlogy(pg, pg))
    return _safe_div(2.0 * mi, hc + hg)


def purity_counts(
    pred_segs: jax.Array,
    pred_mask: jax.Array,
    gold_segs: jax.Array,
    gold_mask: jax.Array,
    n_concepts: int,
) -> jax.Array:
    """The [C, C] (cluster, gold-class) contingency matrix behind purity."""
    iou, mask = _segment_iou_matrix(pred_segs, pred_mask, gold_segs, gold_mask)
    has_overlap = jnp.any(mask & (iou > 0), axis=2)  # [N, Sp]
    best_gold = jnp.argmax(jnp.where(mask, iou, -1.0), axis=2)  # [N, Sp]
    gold_class = jnp.take_along_axis(
        gold_segs[..., 2], best_gold, axis=1
    )  # [N, Sp]
    gold_class = jnp.where(has_overlap & pred_mask, gold_class, 0)
    cluster = jnp.where(pred_mask, pred_segs[..., 2], 0)

    pair = cluster * n_concepts + gold_class
    counts = jax.ops.segment_sum(
        pred_mask.reshape(-1).astype(jnp.float32),
        pair.reshape(-1),
        num_segments=n_concepts * n_concepts,
    ).reshape(n_concepts, n_concepts)
    counts = counts.at[0, :].set(0.0)  # drop masked slots bucketed at cluster 0
    return counts
