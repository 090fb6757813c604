"""Segmental embedded k-means / GMM word discoverers (audio-only baselines).

Reference counterpart: the comparison models — Kamper-style segmental
embedded k-means and its GMM softening (SURVEY.md §2 C9: downsample segment
-> fixed-dim embedding -> cluster; alternate with a re-segmentation pass).

TPU-first design: everything is batched over the corpus with static shapes.

  embed    all candidate segments (end t, length l<=L) at once: a fixed
           bilinear resampling gather -> [N, T, L, n_samples*D]
  assign   one matmul against the centroid matrix -> min distance [N, T, L]
  re-segment  per-utterance DP cost[t] = min_l cost[t-l] + segcost[t, l]
           as a lax.scan over time (vmapped over the corpus)
  update   k-means centroid update as one segment_sum over winning segments

The cluster ids are unsupervised word classes; evaluation uses boundary
P/R/F1 and cluster purity (word classes have no concept mapping, exactly as
in the reference's audio-only baselines).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from multimodalworddiscovery_tpu.data.corpus import Corpus

_BIG = 1e30


@struct.dataclass
class SegKMeansParams:
    centroids: jax.Array  # [K, n_samples * D]
    n_samples: int = struct.field(pytree_node=False, default=4)
    max_seg_len: int = struct.field(pytree_node=False, default=8)
    min_seg_len: int = struct.field(pytree_node=False, default=1)


def embed_all_segments(
    x: jax.Array, n_samples: int, max_seg_len: int
) -> jax.Array:
    """All candidate segment embeddings.

    x: [N, T, D] frames.  Returns [N, T, L, n_samples*D] where slot (t, l)
    embeds the segment x[t-l : t+1-...]... precisely: ending AT index t
    (inclusive) with length l+1, downsampled to n_samples frames by linear
    interpolation.
    """
    n, t_len, d = x.shape
    lengths = jnp.arange(1, max_seg_len + 1)  # [L]
    t_end = jnp.arange(t_len)  # segment covers [t_end - l + 1, t_end]
    rel = (jnp.arange(n_samples) + 0.5) / n_samples  # [S]
    # sample positions: start + rel * (l - 1)
    start = t_end[:, None] - lengths[None, :] + 1  # [T, L]
    pos = start[:, :, None] + rel[None, None, :] * (lengths[:, None] - 1)  # [T, L, S]
    pos = jnp.clip(pos, 0.0, t_len - 1.0)
    p0 = jnp.floor(pos).astype(jnp.int32)
    p1 = jnp.minimum(p0 + 1, t_len - 1)
    w = (pos - p0)[None, :, :, :, None]  # [1, T, L, S, 1]
    g0 = x[:, p0]  # [N, T, L, S, D]
    g1 = x[:, p1]
    emb = g0 * (1 - w) + g1 * w
    return emb.reshape(n, t_len, max_seg_len, n_samples * d)


def _seg_costs(params: SegKMeansParams, emb: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Min squared distance to a centroid (and argmin) per candidate segment.

    emb: [N, T, L, E] -> (cost [N, T, L], label [N, T, L]).
    ||e - c||^2 = ||e||^2 - 2 e.c + ||c||^2 ; the cross term is one matmul.
    """
    c = params.centroids  # [K, E]
    e2 = jnp.sum(emb**2, axis=-1, keepdims=True)  # [N,T,L,1]
    c2 = jnp.sum(c**2, axis=-1)  # [K]
    cross = jnp.einsum("ntle,ke->ntlk", emb, c)
    d2 = e2 - 2 * cross + c2[None, None, None, :]
    return jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32)


def _resegment_one(seg_cost: jax.Array, length: jax.Array, min_len: int) -> jax.Array:
    """DP over one utterance: choose lengths minimizing total segment cost.

    seg_cost: [T, L] cost of segment ending at t with length l+1.
    Returns best_len [T]: for each end position, the optimal segment length
    (used by the backtrace); positions >= length are irrelevant.
    """
    t_len, max_l = seg_cost.shape

    def step(cost_hist, t):
        # cost_hist: [T+1] accumulated DP costs, cost_hist[i] = best cost of
        # segmenting x[0:i]
        ls = jnp.arange(1, max_l + 1)
        prev = t + 1 - ls  # segment [prev, t], needs prev >= 0
        valid = (prev >= 0) & (ls >= min_len)
        prior = jnp.where(valid, cost_hist[jnp.maximum(prev, 0)], _BIG)
        total = prior + jnp.where(valid, seg_cost[t], _BIG)
        best = jnp.min(total)
        best_l = jnp.argmin(total).astype(jnp.int32) + 1
        cost_hist = cost_hist.at[t + 1].set(best)
        return cost_hist, best_l

    init = jnp.full((t_len + 1,), _BIG).at[0].set(0.0)
    _, best_len = jax.lax.scan(step, init, jnp.arange(t_len))
    return best_len


def _backtrace_boundaries(best_len: jax.Array, length: jax.Array) -> jax.Array:
    """best_len [T] -> seg_id per frame [T] via reverse walk (scan)."""
    t_len = best_len.shape[0]

    # walk from the end: at position t (0-based, end of segment), the segment
    # covers [t - best_len[t] + 1, t]
    def step(carry, t):
        # carry: next boundary end position to process (as we go right->left)
        cur_end = carry
        is_end = t == cur_end
        l = best_len[jnp.clip(cur_end, 0, t_len - 1)]
        new_end = jnp.where(is_end, cur_end - l, cur_end)
        return new_end, is_end

    last = jnp.clip(length - 1, 0, t_len - 1)
    _, is_end_rev = jax.lax.scan(step, last, jnp.arange(t_len - 1, -1, -1))
    is_end = is_end_rev[::-1]  # [T] True where a segment ends
    # segment id per frame = number of segment-ends strictly before t
    ends_before = jnp.cumsum(is_end) - is_end.astype(jnp.int32)
    return ends_before.astype(jnp.int32), is_end


def init(
    corpus: Corpus,
    n_clusters: int = 64,
    n_samples: int = 4,
    max_seg_len: int = 8,
    min_seg_len: int = 1,
    key: jax.Array | None = None,
) -> SegKMeansParams:
    """Centroids from randomly chosen candidate segment embeddings."""
    if key is None:
        key = jax.random.PRNGKey(0)
    emb = embed_all_segments(corpus.src, n_samples, max_seg_len)
    n, t_len, L, e = emb.shape
    flat = emb.reshape(-1, e)
    # sample only valid segments (end < len, start >= 0)
    t_idx = jnp.arange(t_len)[None, :, None]
    l_idx = jnp.arange(1, L + 1)[None, None, :]
    valid = (t_idx < corpus.src_len[:, None, None]) & (t_idx - l_idx + 1 >= 0)
    probs = valid.reshape(-1).astype(jnp.float32)
    idx = jax.random.choice(
        key, flat.shape[0], (n_clusters,), replace=False, p=probs / probs.sum()
    )
    return SegKMeansParams(
        centroids=flat[idx],
        n_samples=n_samples,
        max_seg_len=max_seg_len,
        min_seg_len=min_seg_len,
    )


def expected_counts(
    params: SegKMeansParams, corpus: Corpus
) -> tuple[tuple[jax.Array, jax.Array, jax.Array], jax.Array]:
    """E-step of one ES-KMeans iteration: re-segment (DP) + re-assign, and
    return the centroid sufficient statistics
    ((per-cluster embedding sums [K,E], per-cluster counts [K],
    n_segments []), -total distortion).

    All three statistics are ADDITIVE across corpus shards — the property
    the streaming / shard_map / multihost EM wrappers rely on, same as the
    HMM family's count tensors."""
    emb = embed_all_segments(corpus.src, params.n_samples, params.max_seg_len)
    seg_cost, seg_label = _seg_costs(params, emb)
    n, t_len, L = seg_cost.shape

    # mask invalid candidates (end beyond utterance, start before 0)
    t_idx = jnp.arange(t_len)[None, :, None]
    l_idx = jnp.arange(1, L + 1)[None, None, :]
    valid = (t_idx < corpus.src_len[:, None, None]) & (t_idx - l_idx + 1 >= 0)
    seg_cost = jnp.where(valid, seg_cost, _BIG)

    best_len = jax.vmap(
        lambda sc, ln: _resegment_one(sc, ln, params.min_seg_len)
    )(seg_cost, corpus.src_len)
    _, is_end = jax.vmap(_backtrace_boundaries)(best_len, corpus.src_len)
    tmask = corpus.src_mask()
    is_end = is_end & tmask

    # chosen segments: (n, t) where is_end; embedding slot (t, best_len-1)
    chosen_l = jnp.clip(best_len - 1, 0, L - 1)
    chosen_emb = jnp.take_along_axis(
        emb, chosen_l[:, :, None, None], axis=2
    )[:, :, 0, :]  # [N, T, E]
    chosen_label = jnp.take_along_axis(seg_label, chosen_l[:, :, None], axis=2)[
        :, :, 0
    ]  # [N, T]

    k = params.centroids.shape[0]
    lbl = jnp.where(is_end, chosen_label, k)  # discard slot k
    # one-hot MXU contractions, not segment_sum scatters (CLAUDE.md EM-count
    # rule); the DP re-segmentation dominates this step, so the rewrite's
    # win is modest — current measurement lives in bench/results.jsonl
    # ("segkmeans_em", best-of-3), quoted in README's model table.
    # Non-end rows land in the discarded slot k, so no explicit weighting.
    hi = jax.lax.Precision.HIGHEST
    oh = jax.nn.one_hot(lbl.reshape(-1), k + 1, dtype=emb.dtype)  # [NT, K+1]
    sums = jnp.einsum(
        "nk,ne->ke", oh, chosen_emb.reshape(-1, chosen_emb.shape[-1]),
        precision=hi,
    )[:k]
    counts = jnp.einsum("nk->k", oh, precision=hi)[:k]
    total_cost = jnp.sum(
        jnp.where(is_end, jnp.take_along_axis(seg_cost, chosen_l[:, :, None], axis=2)[:, :, 0], 0.0)
    )
    # 'loglik' = negative distortion, for uniform CLI monotonicity displays
    return (sums, counts, jnp.sum(is_end)), -total_cost


def m_step(
    params: SegKMeansParams,
    counts: tuple[jax.Array, jax.Array, jax.Array],
) -> SegKMeansParams:
    """Centroid update from the (possibly shard-summed) statistics; empty
    clusters keep their previous centroid."""
    sums, cnt, _ = counts
    new_centroids = jnp.where(
        cnt[:, None] > 0, sums / jnp.maximum(cnt[:, None], 1), params.centroids
    )
    return SegKMeansParams(
        centroids=new_centroids.astype(params.centroids.dtype),
        n_samples=params.n_samples,
        max_seg_len=params.max_seg_len,
        min_seg_len=params.min_seg_len,
    )


@jax.jit
def em_step(
    params: SegKMeansParams, corpus: Corpus
) -> tuple[SegKMeansParams, dict[str, jax.Array]]:
    """One ES-KMeans iteration: re-segment (DP) + re-assign + centroid update."""
    counts, ll = expected_counts(params, corpus)
    return m_step(params, counts), {"loglik": ll, "n_segments": counts[2]}


@jax.jit
def discover(params: SegKMeansParams, corpus: Corpus) -> tuple[jax.Array, jax.Array]:
    """Final segmentation + word classes.

    Returns (segments [N, T, 3] (start, end_excl, cluster_id+1), seg_mask).
    Cluster ids are shifted by +1 so 0 stays 'not a word unit' in the shared
    segment format.
    """
    emb = embed_all_segments(corpus.src, params.n_samples, params.max_seg_len)
    seg_cost, seg_label = _seg_costs(params, emb)
    n, t_len, L = seg_cost.shape
    t_idx = jnp.arange(t_len)[None, :, None]
    l_idx = jnp.arange(1, L + 1)[None, None, :]
    valid = (t_idx < corpus.src_len[:, None, None]) & (t_idx - l_idx + 1 >= 0)
    seg_cost = jnp.where(valid, seg_cost, _BIG)
    best_len = jax.vmap(
        lambda sc, ln: _resegment_one(sc, ln, params.min_seg_len)
    )(seg_cost, corpus.src_len)
    _, is_end = jax.vmap(_backtrace_boundaries)(best_len, corpus.src_len)
    is_end = is_end & corpus.src_mask()

    chosen_l = jnp.clip(best_len - 1, 0, L - 1)
    chosen_label = jnp.take_along_axis(seg_label, chosen_l[:, :, None], axis=2)[:, :, 0]

    t_pos = jnp.arange(t_len)[None, :]
    starts = jnp.where(is_end, t_pos - best_len + 1, 0)
    ends = jnp.where(is_end, t_pos + 1, 0)
    labels = jnp.where(is_end, chosen_label + 1, 0)
    segments = jnp.stack([starts, ends, labels], axis=-1).astype(jnp.int32)
    return segments, is_end


def train(
    params: SegKMeansParams, corpus: Corpus, num_iterations: int
) -> tuple[SegKMeansParams, jax.Array]:
    def body(p, _):
        p2, stats = em_step(p, corpus)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)


# ---------------------------------------------------------------------------
# GMM softening (reference audio_gmm_word_discoverer, SURVEY.md §2 C9):
# same candidate embeddings and DP re-segmentation, but cluster updates use
# soft responsibilities under spherical Gaussians instead of hard assignment.
# ---------------------------------------------------------------------------


@struct.dataclass
class SegGMMParams:
    centroids: jax.Array  # [K, E] means
    log_var: jax.Array  # scalar, shared spherical variance
    n_samples: int = struct.field(pytree_node=False, default=4)
    max_seg_len: int = struct.field(pytree_node=False, default=8)
    min_seg_len: int = struct.field(pytree_node=False, default=1)


def init_gmm(
    corpus: Corpus,
    n_clusters: int = 64,
    n_samples: int = 4,
    max_seg_len: int = 8,
    min_seg_len: int = 1,
    key: jax.Array | None = None,
) -> SegGMMParams:
    km = init(corpus, n_clusters, n_samples, max_seg_len, min_seg_len, key)
    return SegGMMParams(
        centroids=km.centroids,
        log_var=jnp.asarray(0.0, jnp.float32),
        n_samples=n_samples,
        max_seg_len=max_seg_len,
        min_seg_len=min_seg_len,
    )


@jax.jit
def em_step_gmm(
    params: SegGMMParams, corpus: Corpus
) -> tuple[SegGMMParams, dict[str, jax.Array]]:
    """Segmentation by DP on expected (soft-min) costs; soft cluster update."""
    hard = SegKMeansParams(
        centroids=params.centroids,
        n_samples=params.n_samples,
        max_seg_len=params.max_seg_len,
        min_seg_len=params.min_seg_len,
    )
    emb = embed_all_segments(corpus.src, params.n_samples, params.max_seg_len)
    n, t_len, L, e = emb.shape
    c = params.centroids
    e2 = jnp.sum(emb**2, axis=-1, keepdims=True)
    c2 = jnp.sum(c**2, axis=-1)
    d2 = e2 - 2 * jnp.einsum("ntle,ke->ntlk", emb, c) + c2  # [N,T,L,K]
    var = jnp.exp(params.log_var)
    # segment cost = -log sum_k exp(-d2 / 2 var): soft-min over clusters
    logp = -d2 / (2 * var)
    m = jnp.max(logp, axis=-1)
    seg_cost = -(m + jnp.log(jnp.sum(jnp.exp(logp - m[..., None]), axis=-1) + 1e-38))

    t_idx = jnp.arange(t_len)[None, :, None]
    l_idx = jnp.arange(1, L + 1)[None, None, :]
    valid = (t_idx < corpus.src_len[:, None, None]) & (t_idx - l_idx + 1 >= 0)
    seg_cost = jnp.where(valid, seg_cost, _BIG)

    best_len = jax.vmap(lambda sc, ln: _resegment_one(sc, ln, params.min_seg_len))(
        seg_cost, corpus.src_len
    )
    _, is_end = jax.vmap(_backtrace_boundaries)(best_len, corpus.src_len)
    is_end = is_end & corpus.src_mask()

    chosen_l = jnp.clip(best_len - 1, 0, L - 1)
    chosen_emb = jnp.take_along_axis(emb, chosen_l[:, :, None, None], axis=2)[:, :, 0, :]
    chosen_logp = jnp.take_along_axis(logp, chosen_l[:, :, None, None], axis=2)[:, :, 0, :]
    resp = jax.nn.softmax(chosen_logp, axis=-1)  # [N, T, K]
    w = is_end.astype(emb.dtype)[..., None]
    resp = resp * w

    sums = jnp.einsum("ntk,nte->ke", resp, chosen_emb)
    counts = jnp.sum(resp, axis=(0, 1))
    new_centroids = jnp.where(
        counts[:, None] > 1e-6, sums / jnp.maximum(counts[:, None], 1e-6), params.centroids
    )
    # shared spherical variance from soft assignments
    chosen_d2 = jnp.take_along_axis(d2, chosen_l[:, :, None, None], axis=2)[:, :, 0, :]
    var_new = jnp.sum(resp * chosen_d2) / jnp.maximum(jnp.sum(counts) * e, 1e-6)
    total_cost = jnp.sum(
        jnp.where(is_end, jnp.take_along_axis(seg_cost, chosen_l[:, :, None], axis=2)[:, :, 0], 0.0)
    )
    new_params = SegGMMParams(
        centroids=new_centroids.astype(params.centroids.dtype),
        log_var=jnp.log(jnp.maximum(var_new, 1e-6)),
        n_samples=params.n_samples,
        max_seg_len=params.max_seg_len,
        min_seg_len=params.min_seg_len,
    )
    return new_params, {"loglik": -total_cost, "n_segments": jnp.sum(is_end)}


def discover_gmm(params: SegGMMParams, corpus: Corpus):
    """Hard decode with the GMM's centroids (argmax responsibility)."""
    hard = SegKMeansParams(
        centroids=params.centroids,
        n_samples=params.n_samples,
        max_seg_len=params.max_seg_len,
        min_seg_len=params.min_seg_len,
    )
    return discover(hard, corpus)
