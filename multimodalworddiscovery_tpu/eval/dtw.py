"""Batched on-device DTW.

Reference counterpart: per-segment-pair O(T1*T2) Python DP in the eval
scripts (SURVEY.md §3.5 🔥).  Here the DP runs as one ``lax.scan`` over rows
with the in-row dependency resolved by a min-plus prefix scan:

  D[i,j] = c[i,j] + min(D[i-1,j], D[i-1,j-1], D[i,j-1])

Let E[j] = min(D[i-1,j], D[i-1,j-1]) and S = cumsum(c[i]).  Unrolling the
in-row recursion gives D[i,j] = S[j] + cummin_j(E - shift(S)), so each row is
pure vector work (VPU-friendly) and the whole batch is vmapped.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e30


def _pairwise_cost(x: jax.Array, y: jax.Array, metric: str) -> jax.Array:
    """[T1, D] x [T2, D] -> [T1, T2] frame distances."""
    if metric == "sqeuclidean":
        return jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    if metric == "euclidean":
        return jnp.sqrt(jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1) + 1e-12)
    if metric == "cosine":
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-12)
        return 1.0 - xn @ yn.T
    raise ValueError(f"unknown metric {metric!r}")


def _dtw_single(cost: jax.Array, len_x: jax.Array, len_y: jax.Array) -> jax.Array:
    """DTW distance for one padded cost matrix [T1, T2] with true lengths."""
    t1, t2 = cost.shape
    col_idx = jnp.arange(t2)
    cost = jnp.where(col_idx[None, :] < len_y, cost, _BIG)

    def row_step(prev, row_cost):
        # prev: D[i-1, :] (BIG outside valid region)
        e = jnp.minimum(prev, jnp.concatenate([jnp.full((1,), _BIG), prev[:-1]]))
        s = jnp.cumsum(row_cost)
        s_shift = jnp.concatenate([jnp.zeros((1,)), s[:-1]])
        d = s + jax.lax.cummin(e - s_shift)
        return d, d

    # First row: D[0,j] = cumsum(cost[0, :j+1]) for valid j.
    first = jnp.cumsum(cost[0])
    first = jnp.where(col_idx < len_y, first, _BIG)
    rows_rest = cost[1:]
    _, all_rows = jax.lax.scan(row_step, first, rows_rest)
    full = jnp.concatenate([first[None, :], all_rows], axis=0)  # [T1, T2]
    d = full[
        jnp.clip(len_x - 1, 0, t1 - 1),
        jnp.clip(len_y - 1, 0, t2 - 1),
    ]
    return d


@functools.partial(jax.jit, static_argnames=("metric", "normalize"))
def dtw_distance(
    x: jax.Array,
    y: jax.Array,
    len_x: jax.Array,
    len_y: jax.Array,
    metric: str = "sqeuclidean",
    normalize: bool = False,
) -> jax.Array:
    """Batched DTW distances.

    x: [B, T1, D], y: [B, T2, D], len_x/len_y: [B] true lengths.
    Returns [B] distances (optionally normalized by len_x + len_y).
    """

    def one(xi, yi, lx, ly):
        cost = _pairwise_cost(xi, yi, metric)
        # mask rows beyond len_x so the scan carries BIG harmlessly; the
        # readout indexes (len_x-1, len_y-1) so trailing rows never matter.
        return _dtw_single(cost, lx, ly)

    d = jax.vmap(one)(x, y, len_x, len_y)
    if normalize:
        d = d / jnp.maximum(len_x + len_y, 1).astype(d.dtype)
    return d


def segment_dtw_matrix(
    feats: jax.Array,
    segments: jax.Array,
    seg_mask: jax.Array,
    max_seg_len: int = 32,
    metric: str = "sqeuclidean",
    batch_size: int = 64,
) -> tuple[jax.Array, jax.Array]:
    """Pairwise DTW distances between ALL discovered word segments.

    Reference use-case (SURVEY.md §3.5): segment-level DTW scoring to compare
    discovered word units across utterances (e.g. within-cluster coherence).

    feats: [N, T, D]; segments [N, S, 3]; seg_mask [N, S].
    Extracts every valid segment into a fixed [M, max_seg_len, D] buffer
    (truncating longer ones) and returns (dist [M, M], flat index -> (n, s)
    mapping [M, 2]).  M is static = N * S; invalid rows carry BIG distances.
    """
    n, t, d = feats.shape
    s = segments.shape[1]
    m = n * s

    starts = segments[..., 0].reshape(-1)  # [M]
    ends = segments[..., 1].reshape(-1)
    valid = seg_mask.reshape(-1)
    lens = jnp.clip(ends - starts, 0, max_seg_len)
    utt = jnp.repeat(jnp.arange(n), s)

    # gather fixed-size windows
    offs = jnp.arange(max_seg_len)
    idx = jnp.clip(starts[:, None] + offs[None, :], 0, t - 1)  # [M, L]
    seg_feats = feats[utt[:, None], idx]  # [M, L, D]

    def score_one(args):
        xi, li = args  # [L, D], [] (lax.map vmaps this over batch_size chunks)
        return dtw_distance(
            jnp.broadcast_to(xi[None], (m, max_seg_len, d)),
            seg_feats,
            jnp.broadcast_to(li[None], (m,)),
            lens,
            metric=metric,
            normalize=True,
        )

    dist = jax.lax.map(
        score_one, (seg_feats, lens), batch_size=batch_size
    ).reshape(m, m)
    dist = jnp.where(valid[:, None] & valid[None, :], dist, _BIG)
    index = jnp.stack([utt, jnp.tile(jnp.arange(s), n)], axis=-1)
    return dist, index


def _extract_segments(
    feats: jax.Array, segments: jax.Array, seg_mask: jax.Array, max_seg_len: int
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Flatten per-utterance segments into a fixed [M, L, D] buffer.

    Returns (seg_feats [M,L,D], lens [M], labels [M], utt [M]); invalid slots
    have len 0 and label -1."""
    n, t, d = feats.shape
    s = segments.shape[1]
    starts = segments[..., 0].reshape(-1)
    ends = segments[..., 1].reshape(-1)
    labels = segments[..., 2].reshape(-1)
    valid = seg_mask.reshape(-1)
    lens = jnp.where(valid, jnp.clip(ends - starts, 0, max_seg_len), 0)
    labels = jnp.where(valid, labels, -1)
    utt = jnp.repeat(jnp.arange(n), s)
    offs = jnp.arange(max_seg_len)
    idx = jnp.clip(starts[:, None] + offs[None, :], 0, t - 1)
    return feats[utt[:, None], idx], lens, labels, utt


def cluster_dtw_coherence(
    feats: jax.Array,
    segments: jax.Array,
    seg_mask: jax.Array,
    max_seg_len: int = 32,
    metric: str = "sqeuclidean",
    batch_size: int = 64,
) -> dict[str, jax.Array]:
    """Within- vs across-cluster mean DTW distance of discovered word units.

    Reference use-case (SURVEY.md §3.5): segment-level DTW scoring — units
    assigned to the same concept should be acoustically closer to each other
    (within) than to units of other concepts (across); ratio < 1 = coherent.
    All on device; returns {"within", "across", "ratio"}.
    """
    dist, _ = segment_dtw_matrix(
        feats, segments, seg_mask, max_seg_len, metric, batch_size
    )
    labels = jnp.where(seg_mask, segments[..., 2], -1).reshape(-1)
    valid = labels >= 0
    pair_ok = (valid[:, None] & valid[None, :]) & ~jnp.eye(
        labels.shape[0], dtype=bool
    )
    same = pair_ok & (labels[:, None] == labels[None, :])
    diff = pair_ok & (labels[:, None] != labels[None, :])
    d0 = jnp.where(dist < _BIG / 2, dist, 0.0)
    within = jnp.sum(jnp.where(same, d0, 0.0)) / jnp.maximum(jnp.sum(same), 1)
    across = jnp.sum(jnp.where(diff, d0, 0.0)) / jnp.maximum(jnp.sum(diff), 1)
    return {
        "within": within,
        "across": across,
        "ratio": within / jnp.maximum(across, 1e-9),
    }


def dtw_to_gold(
    feats: jax.Array,
    pred_segments: jax.Array,
    pred_mask: jax.Array,
    gold_segments: jax.Array,
    gold_mask: jax.Array,
    max_seg_len: int = 32,
    metric: str = "sqeuclidean",
    batch_size: int = 64,
) -> jax.Array:
    """Mean (over predicted units) of the normalized DTW distance to the
    CLOSEST gold unit in the same utterance — 0 when every discovered unit
    coincides with a gold word (SURVEY.md §3.5 "DTW scoring" vs gold)."""
    pf, plen, _, putt = _extract_segments(feats, pred_segments, pred_mask, max_seg_len)
    gf, glen, _, gutt = _extract_segments(feats, gold_segments, gold_mask, max_seg_len)
    mp, mg = pf.shape[0], gf.shape[0]
    d = feats.shape[-1]

    def score_one(args):
        xi, li = args
        return dtw_distance(
            jnp.broadcast_to(xi[None], (mg, max_seg_len, d)),
            gf,
            jnp.broadcast_to(li[None], (mg,)),
            glen,
            metric=metric,
            normalize=True,
        )

    cross = jax.lax.map(score_one, (pf, plen), batch_size=batch_size)  # [Mp, Mg]
    ok = (plen[:, None] > 0) & (glen[None, :] > 0) & (putt[:, None] == gutt[None, :])
    cross = jnp.where(ok, cross, _BIG)
    best = jnp.min(cross, axis=1)  # [Mp]
    has_match = jnp.any(ok, axis=1) & (plen > 0)
    return jnp.sum(jnp.where(has_match, best, 0.0)) / jnp.maximum(
        jnp.sum(has_match), 1
    )
