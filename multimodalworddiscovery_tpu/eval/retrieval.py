"""Cross-modal retrieval: image search / annotation from alignment scores.

Reference counterpart: retrieval scripts scoring (image, caption) pairs from
translation probabilities and ranking (SURVEY.md §3.5).  Here the full N x N
score matrix is computed on device with a ``lax.map`` over captions (each step
is one gather + masked logsumexp over all images).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF, masked_logsumexp
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models.model1 import Model1Params, _extended_targets


def retrieval_scores_model1(params: Model1Params, corpus: Corpus) -> jax.Array:
    """Model-1 log-likelihood of every (caption i, image j) pair -> [N, N].

    Row i scores caption i against every image's concept sequence; the true
    pairing is the diagonal.
    """
    trg_ext, ext_mask = _extended_targets(corpus)  # [N, 1+Tt]
    src_mask = corpus.src_mask()
    tt1 = trg_ext.shape[1]

    def one_caption(args):
        src_row, src_mask_row, src_len_row = args  # [Ts], [Ts], []
        logp_rows = params.log_t[src_row]  # [Ts, V_trg]
        # [N_img, Ts, 1+Tt]
        pair = logp_rows[:, trg_ext.reshape(-1)].reshape(-1, corpus.n, tt1).transpose(1, 0, 2)
        mask = src_mask_row[None, :, None] & ext_mask[:, None, :]
        pair = jnp.where(mask, pair, NEG_INF)
        per_pos = masked_logsumexp(pair, axis=-1)  # [N_img, Ts]
        ll = jnp.sum(jnp.where(src_mask_row[None, :], per_pos, 0.0), axis=1)
        prior = -jnp.log1p(corpus.trg_len.astype(ll.dtype))
        return ll + src_len_row.astype(ll.dtype) * prior

    return jax.lax.map(
        one_caption, (corpus.src, src_mask, corpus.src_len), batch_size=32
    )


def retrieval_scores_hmm_family(
    mod, params, corpus: Corpus, batch_size: int = 8
) -> jax.Array:
    """Forward log-likelihood of every (caption i, image j) pair -> [N, N]
    for ANY Vogel-HMM aligner module (hmm / hmm_gaussian / hmm_dnn / hmm_crf
    — anything exposing ``_machinery``).

    Each lax.map step re-pairs one block of captions against ALL images and
    runs the batched forward pass (hmm_core.forward) on the cross product.
    O(N^2) total — intended for evaluation-sized corpora, mirroring the
    reference's retrieval scripts (SURVEY.md §3.5).
    """
    from multimodalworddiscovery_tpu.models import hmm_core

    n = corpus.n

    def one_caption(args):
        src_row, src_len_row = args  # [Ts] or [Ts, D], []
        paired = Corpus(
            src=jnp.broadcast_to(src_row[None], (n,) + src_row.shape),
            src_len=jnp.broadcast_to(src_len_row[None], (n,)),
            trg=corpus.trg,
            trg_len=corpus.trg_len,
            src_vocab=corpus.src_vocab,
            trg_vocab=corpus.trg_vocab,
        )
        log_init, log_trans, log_emit = mod._machinery(params, paired)
        _, logz = hmm_core.forward(log_init, log_trans, log_emit, paired.src_len)
        return logz  # [N_img]

    return jax.lax.map(
        one_caption, (corpus.src, corpus.src_len), batch_size=batch_size
    )


def retrieval_scores_hmm(params, corpus: Corpus, batch_size: int = 8) -> jax.Array:
    """Discrete-HMM pair logliks (see retrieval_scores_hmm_family)."""
    from multimodalworddiscovery_tpu.models import hmm as hmm_mod

    return retrieval_scores_hmm_family(hmm_mod, params, corpus, batch_size)


def retrieval_scores_hmm_family_pooled(
    mod, params, corpus: Corpus, candidates: jax.Array, batch_size: int = 8,
    direction: str = "c2i",
) -> jax.Array:
    """Pooled variant for any Vogel-HMM module -> [N, C].

    direction="c2i" (image search): caption i scored against its [C]
    candidate images.  direction="i2c" (image annotation, the reference's
    other retrieval task — SURVEY.md §3.5): image i scored against its [C]
    candidate captions.  Both rank by the same forward loglik
    p(caption | image's concepts); only which side the pool re-pairs flips.
    """
    from multimodalworddiscovery_tpu.models import hmm_core

    c = candidates.shape[1]
    if direction not in ("c2i", "i2c"):
        raise ValueError(f"direction must be c2i|i2c, got {direction!r}")

    def one_row(args):
        src_row, src_len_row, trg_row, trg_len_row, cand = args
        if direction == "c2i":
            src = jnp.broadcast_to(src_row[None], (c,) + src_row.shape)
            src_len = jnp.broadcast_to(src_len_row[None], (c,))
            trg, trg_len = corpus.trg[cand], corpus.trg_len[cand]
        else:
            src, src_len = corpus.src[cand], corpus.src_len[cand]
            trg = jnp.broadcast_to(trg_row[None], (c,) + trg_row.shape)
            trg_len = jnp.broadcast_to(trg_len_row[None], (c,))
        paired = Corpus(
            src=src, src_len=src_len, trg=trg, trg_len=trg_len,
            src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
        )
        log_init, log_trans, log_emit = mod._machinery(params, paired)
        _, logz = hmm_core.forward(log_init, log_trans, log_emit, paired.src_len)
        return logz

    return jax.lax.map(
        one_row,
        (corpus.src, corpus.src_len, corpus.trg, corpus.trg_len, candidates),
        batch_size=batch_size,
    )


def sample_candidate_pools(
    n: int, pool_size: int, key: jax.Array
) -> jax.Array:
    """[N, C] candidate image indices per caption; column 0 is the true image.

    The standard large-corpus retrieval protocol (recall@k over fixed-size
    pools): full N x N scoring is O(N^2) forwards and cannot scale to the
    MSCOCO-sized corpora of BASELINE config #4, while pools keep scoring
    O(N * C) with the same ranking semantics per pool.
    """
    if pool_size > n:
        raise ValueError(f"pool_size {pool_size} > corpus size {n}")
    true = jnp.arange(n)[:, None]
    if n <= 16384:
        # exact protocol: DISTINCT distractors per caption (duplicates would
        # double-count a high-scoring distractor in the rank statistic)
        draws = jax.vmap(
            lambda k: jax.random.choice(k, n - 1, (pool_size - 1,), replace=False)
        )(jax.random.split(key, n))
    else:
        # corpora too large for per-row no-replacement sampling: iid draws
        # (expected duplicates per pool ~ pool^2 / 2n — negligible when
        # pool << n, the only regime pools are used at this scale)
        draws = jax.random.randint(key, (n, pool_size - 1), 0, n - 1)
    draws = jnp.where(draws >= true, draws + 1, draws)  # never the true image
    return jnp.concatenate([true, draws], axis=1)


def retrieval_scores_hmm_pooled(
    params, corpus: Corpus, candidates: jax.Array, batch_size: int = 8
) -> jax.Array:
    """HMM forward loglik of caption i vs its candidate images -> [N, C]."""
    from multimodalworddiscovery_tpu.models import hmm as hmm_mod
    from multimodalworddiscovery_tpu.models import hmm_core

    c = candidates.shape[1]

    def one_caption(args):
        src_row, src_len_row, cand = args  # [Ts], [], [C]
        paired = Corpus(
            src=jnp.broadcast_to(src_row[None], (c, src_row.shape[0])),
            src_len=jnp.broadcast_to(src_len_row[None], (c,)),
            trg=corpus.trg[cand],
            trg_len=corpus.trg_len[cand],
            src_vocab=corpus.src_vocab,
            trg_vocab=corpus.trg_vocab,
        )
        log_init, log_trans, log_emit = hmm_mod._machinery(params, paired)
        _, logz = hmm_core.forward(log_init, log_trans, log_emit, paired.src_len)
        return logz  # [C]

    return jax.lax.map(
        one_caption, (corpus.src, corpus.src_len, candidates),
        batch_size=batch_size,
    )


def retrieval_scores_model1_pooled(
    params: Model1Params, corpus: Corpus, candidates: jax.Array,
    batch_size: int = 32, direction: str = "c2i",
) -> jax.Array:
    """Model-1 pooled pair logliks -> [N, C] (direction as in
    ``retrieval_scores_hmm_family_pooled``: "c2i" ranks candidate images
    per caption, "i2c" ranks candidate captions per image)."""
    trg_ext, ext_mask = _extended_targets(corpus)  # [N, 1+Tt]
    src_mask = corpus.src_mask()
    tt1 = trg_ext.shape[1]
    c = candidates.shape[1]
    if direction not in ("c2i", "i2c"):
        raise ValueError(f"direction must be c2i|i2c, got {direction!r}")

    def one_caption(args):
        src_row, src_mask_row, src_len_row, cand = args
        logp_rows = params.log_t[src_row]  # [Ts, V_trg]
        te = trg_ext[cand]  # [C, 1+Tt]
        em = ext_mask[cand]
        pair = logp_rows[:, te.reshape(-1)].reshape(-1, c, tt1).transpose(1, 0, 2)
        mask = src_mask_row[None, :, None] & em[:, None, :]
        pair = jnp.where(mask, pair, NEG_INF)
        per_pos = masked_logsumexp(pair, axis=-1)  # [C, Ts]
        ll = jnp.sum(jnp.where(src_mask_row[None, :], per_pos, 0.0), axis=1)
        prior = -jnp.log1p(corpus.trg_len[cand].astype(ll.dtype))
        return ll + src_len_row.astype(ll.dtype) * prior

    def one_image(args):
        te_row, em_row, trg_len_row, cand = args  # [1+Tt], [1+Tt], [], [C]
        srcs = corpus.src[cand]  # [C, Ts]
        sm = src_mask[cand]  # [C, Ts]
        pair = params.log_t[srcs][:, :, te_row]  # [C, Ts, 1+Tt]
        mask = sm[:, :, None] & em_row[None, None, :]
        pair = jnp.where(mask, pair, NEG_INF)
        per_pos = masked_logsumexp(pair, axis=-1)  # [C, Ts]
        ll = jnp.sum(jnp.where(sm, per_pos, 0.0), axis=1)
        prior = -jnp.log1p(trg_len_row.astype(ll.dtype))
        return ll + corpus.src_len[cand].astype(ll.dtype) * prior

    if direction == "c2i":
        return jax.lax.map(
            one_caption, (corpus.src, src_mask, corpus.src_len, candidates),
            batch_size=batch_size,
        )
    return jax.lax.map(
        one_image, (trg_ext, ext_mask, corpus.trg_len, candidates),
        batch_size=batch_size,
    )


def ranks_from_pooled(pool_scores: jax.Array) -> jax.Array:
    """[N, C] pooled scores (column 0 = the true pairing) -> [N] ranks
    (number of distractors scoring strictly higher).  The per-query rank is
    the streamable sufficient statistic of every pooled retrieval metric:
    recall@k and median-rank are functions of the concatenated rank vector,
    so out-of-core evaluation accumulates one int per query across shards."""
    true = pool_scores[:, :1]
    return jnp.sum(pool_scores[:, 1:] > true, axis=1)


def recall_from_ranks(
    ranks, pool_size: int, ks: tuple[int, ...] = (1, 5, 10),
    direction: str = "c2i",
):
    """Recall@k / median-rank from a 1-D rank vector (``ranks_from_pooled``,
    possibly concatenated across shards)."""
    ranks = jnp.asarray(ranks)
    out: dict[str, jax.Array] = {}
    for k in ks:
        out[f"recall@{k}_{direction}"] = jnp.mean((ranks < k).astype(jnp.float32))
    out[f"median_rank_{direction}"] = jnp.median(ranks + 1).astype(jnp.float32)
    out["pool_size"] = jnp.asarray(float(pool_size))
    return out


def recall_at_k_pooled(
    pool_scores: jax.Array, ks: tuple[int, ...] = (1, 5, 10),
    direction: str = "c2i",
) -> dict[str, jax.Array]:
    """Recall@k from [N, C] pooled scores (column 0 = the true pairing)."""
    return recall_from_ranks(
        ranks_from_pooled(pool_scores), pool_scores.shape[1], ks, direction
    )


def dense_candidate_pools(n: int) -> jax.Array:
    """[N, N] exhaustive candidate pools: row i = [i, i+1, ..., i-1] (mod n)
    — every other row as a distractor, true pairing in column 0.  The
    within-shard DENSE retrieval protocol of streamed evaluation: pooled
    scoring with these pools ranks each query against its ENTIRE shard,
    which on a single-shard corpus reproduces resident dense N x N recall
    exactly (same competitor set per query; strict-inequality ranks make the
    self-pairing column placement irrelevant)."""
    i = jnp.arange(n)[:, None]
    return (i + jnp.arange(n)[None, :]) % n


def recall_at_k(scores: jax.Array, ks: tuple[int, ...] = (1, 5, 10)) -> dict[str, jax.Array]:
    """Recall@k both directions from an [N, N] score matrix (diagonal = true).

    caption->image: rank images per caption (rows); image->caption: columns.
    """
    n = scores.shape[0]
    diag = jnp.diagonal(scores)

    # rank = number of competitors scoring strictly higher than the true pair
    rank_c2i = jnp.sum(scores > diag[:, None], axis=1)
    rank_i2c = jnp.sum(scores > diag[None, :], axis=0)

    out: dict[str, jax.Array] = {}
    for k in ks:
        out[f"recall@{k}_c2i"] = jnp.mean((rank_c2i < k).astype(jnp.float32))
        out[f"recall@{k}_i2c"] = jnp.mean((rank_i2c < k).astype(jnp.float32))
    out["median_rank_c2i"] = jnp.median(rank_c2i + 1).astype(jnp.float32)
    out["median_rank_i2c"] = jnp.median(rank_i2c + 1).astype(jnp.float32)
    return out
