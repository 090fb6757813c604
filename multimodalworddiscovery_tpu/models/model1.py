"""Batched IBM Model-1 / mixture aligner EM.

Reference counterpart: the SMT ``*WordDiscoverer`` mixture aligner (SURVEY.md
§2 C5, §3.1) — EM over translation probabilities t(phone | concept) with a
NULL concept, run there as a per-utterance Python loop inside every EM
iteration.  Here one EM step is a single jitted call over the whole padded
corpus:

  E-step: gather log t at [src_i, trg_j] pairs -> [N, Ts, 1+Tt] posteriors
          (one XLA gather + masked softmax; no Python loops)
  M-step: expected counts scatter-added into the [V_src, V_trg] table with
          one segment_sum over flattened (phone, concept) pair ids.

Target position j=0 is the NULL concept (concept id 0); j>=1 refers to the
j-th concept of the paired image, matching the alignment JSON convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from multimodalworddiscovery_tpu.core.counts import pair_counts, table_lookup
from multimodalworddiscovery_tpu.core.logsemiring import (
    NEG_INF,
    masked_logsumexp,
)
from multimodalworddiscovery_tpu.data.corpus import Corpus


@struct.dataclass
class Model1Params:
    """log t(phone f | concept e): [V_src, V_trg]; column 0 is NULL."""

    log_t: jax.Array


def init(corpus: Corpus, dtype=jnp.float32) -> Model1Params:
    """Uniform translation table (reference initializeModel, SURVEY.md §3.1)."""
    if corpus.src.ndim != 2:
        raise ValueError(
            "model1 has DISCRETE emissions (src must be [N, Ts] token ids, "
            f"got src shape {corpus.src.shape}); quantize continuous frames "
            "first — frontend.vq / model.vq_frontend=true (the reference's "
            "k-means-softened continuous-SMT mode) — or use hmm_gaussian"
        )
    v_src, v_trg = corpus.src_vocab, corpus.trg_vocab
    log_t = jnp.full((v_src, v_trg), -jnp.log(v_src), dtype=dtype)
    return Model1Params(log_t=log_t)


def _extended_targets(corpus: Corpus) -> tuple[jax.Array, jax.Array]:
    """Prepend the NULL concept: trg_ext [N, 1+Tt] ids, ext mask [N, 1+Tt]."""
    n = corpus.n
    null_col = jnp.zeros((n, 1), dtype=corpus.trg.dtype)
    trg_ext = jnp.concatenate([null_col, corpus.trg], axis=1)
    ext_mask = jnp.concatenate(
        [jnp.ones((n, 1), dtype=bool), corpus.trg_mask()], axis=1
    )
    return trg_ext, ext_mask


def _pair_logprobs(params: Model1Params, corpus: Corpus) -> tuple[jax.Array, jax.Array]:
    """log t[src_i, e_j] for every (utterance, src pos, ext trg pos).

    Returns (logp [N, Ts, 1+Tt], joint mask [N, Ts, 1+Tt]).
    """
    trg_ext, ext_mask = _extended_targets(corpus)
    # MXU table lookup, not a double gather (23 ms vs ~1 ms on TPU; see
    # core/counts.py::table_lookup)
    logp = table_lookup(params.log_t, corpus.src, trg_ext)
    mask = corpus.src_mask()[:, :, None] & ext_mask[:, None, :]
    return jnp.where(mask, logp, NEG_INF), mask


def posteriors(params: Model1Params, corpus: Corpus) -> jax.Array:
    """E-step alignment posteriors gamma [N, Ts, 1+Tt]; rows sum to 1 on valid
    source positions, are all-zero on padding."""
    logp, mask = _pair_logprobs(params, corpus)
    lse = masked_logsumexp(logp, axis=-1, keepdims=True)
    lse = jnp.where(lse > NEG_INF / 2, lse, 0.0)
    gamma = jnp.exp(logp - lse)
    return jnp.where(mask, gamma, 0.0)


def loglik(params: Model1Params, corpus: Corpus) -> jax.Array:
    """Corpus log-likelihood incl. the uniform 1/(1+Tt) alignment prior.

    Same sufficient-statistic form as ``expected_counts`` (the per-position
    logsumexp over target slots collapses to log R[n, f] because t(f|e)
    depends on the slot only through its concept): two [N, V]-sized MXU
    contractions instead of the materialized [N, Ts, 1+Tt] tensor."""
    h, c = _count_stats(corpus, dtype=params.log_t.dtype)
    hi = jax.lax.Precision.HIGHEST
    r = jnp.einsum("ne,fe->nf", c, jnp.exp(params.log_t), precision=hi)
    r_safe = jnp.maximum(r, 1e-38)
    prior = -jnp.log1p(corpus.trg_len.astype(h.dtype))  # log 1/(1+Tt)
    ll = jnp.sum(jnp.where(h > 0, h * jnp.log(r_safe), 0.0))
    return ll + jnp.sum(corpus.src_len.astype(h.dtype) * prior)


def _count_stats(
    corpus: Corpus, dtype=jnp.float32
) -> tuple[jax.Array, jax.Array]:
    """Corpus-constant sufficient statistics for Model-1 EM.

    H [N, V_src]: per-utterance phone histograms over valid positions;
    C [N, V_trg]: per-utterance concept multiplicities over the EXTENDED
    target (NULL included).  Both are loop-invariant, so XLA hoists them
    out of a training scan — they are computed once per `train` call.
    """
    hi = jax.lax.Precision.HIGHEST
    src_oh = jax.nn.one_hot(corpus.src, corpus.src_vocab, dtype=dtype)
    h = jnp.einsum(
        "ntf,nt->nf", src_oh, corpus.src_mask().astype(dtype), precision=hi,
    )
    trg_ext, ext_mask = _extended_targets(corpus)
    trg_oh = jax.nn.one_hot(trg_ext, corpus.trg_vocab, dtype=dtype)
    c = jnp.einsum(
        "nke,nk->ne", trg_oh, ext_mask.astype(dtype), precision=hi,
    )
    return h, c


def expected_counts(
    params: Model1Params, corpus: Corpus
) -> tuple[jax.Array, jax.Array]:
    """E-step only: expected (phone, concept) counts + corpus loglik.

    Counts are additive across corpus shards/buckets, which is what makes
    length-bucketed and data-parallel EM exact (data/bucketing.py).

    Model-1 factorizes over source positions, so the E-step depends on the
    corpus only through the sufficient statistics (H, C) of
    ``_count_stats``:

        R[n, f]     = sum_e C[n, e] * t(f | e)        (per-utterance evidence)
        gamma-sum   = t(f | e) * sum_n H[n, f] * C[n, e] / R[n, f]
        loglik      = sum_{n, f} H[n, f] * log R[n, f] + prior

    This replaces the reference's per-token posterior loop (SURVEY.md §3.1)
    — and the earlier batched [N, Ts, 1+Tt] softmax + one-hot count matmuls
    — with two [V_src, V_trg]-sized MXU contractions over [N, V] stats:
    measured 0.53 -> 0.24 ms/EM-iteration at the 8k-utterance bench shape
    (33.6 M utt·iter/s; the per-token formulation remains in
    ``posteriors``/``align``, which genuinely need per-position outputs;
    equality is pinned by tests/test_model1.py and the float64 oracle
    parity suite).
    """
    h, c = _count_stats(corpus, dtype=params.log_t.dtype)
    hi = jax.lax.Precision.HIGHEST
    t_exp = jnp.exp(params.log_t)  # [F, E]
    r = jnp.einsum("ne,fe->nf", c, t_exp, precision=hi)  # [N, F]
    r_safe = jnp.maximum(r, 1e-38)
    # A phone whose total probability underflows to ~0 (smoothing=0, restored
    # degenerate tables) must contribute ZERO counts — h / r_safe alone can
    # overflow float32 to inf (h up to Ts over a 1e-38 floor), poisoning the
    # whole M-step where the old log-space path degraded gracefully.
    a = jnp.where(r > 1e-30, h / r_safe, 0.0)  # [N, F]
    counts = t_exp * jnp.einsum("nf,ne->fe", a, c, precision=hi)

    prior = -jnp.log1p(corpus.trg_len.astype(h.dtype))
    ll = jnp.sum(jnp.where(h > 0, h * jnp.log(r_safe), 0.0))
    ll = ll + jnp.sum(corpus.src_len.astype(h.dtype) * prior)
    return counts, ll


def m_step(
    params: Model1Params, counts: jax.Array, smoothing: float = 1e-8
) -> Model1Params:
    counts = counts + smoothing
    totals = jnp.sum(counts, axis=0, keepdims=True)  # normalize over phones per concept
    new_log_t = jnp.log(counts) - jnp.log(totals)
    return Model1Params(log_t=new_log_t.astype(params.log_t.dtype))


def em_step(
    params: Model1Params, corpus: Corpus, smoothing: float = 1e-8
) -> tuple[Model1Params, dict[str, jax.Array]]:
    """One full EM iteration over the corpus (E + M), jittable.

    Replaces the reference's `for utt in corpus` loop inside trainUsingEM
    (SURVEY.md §3.1 🔥) with two sufficient-statistic MXU contractions
    (see ``expected_counts``).
    """
    counts, ll = expected_counts(params, corpus)
    return m_step(params, counts, smoothing), {"loglik": ll}


def align(params: Model1Params, corpus: Corpus) -> jax.Array:
    """Viterbi-style decode: argmax_j t(f_i | e_j) per source token.

    Returns [N, Ts] int32: 0 = NULL, j>=1 = 1-based trg position; padding
    positions are 0 (reference align(), SURVEY.md §3.1).

    Production path is the DENSE argmax (``_align_dense``): measured faster
    than the concept-space formulation at both the sparse (Tt=6: 1.06 vs
    1.33 ms, N=8000) and dense (Tt=32: 2.02 vs 2.30 ms, N=2048) target
    regimes — the per-slot column select's K=1+Tt VPU passes stay cheaper
    than the concept-space max + attains-indicator contraction at every
    realistic caption density (bench/results.jsonl ``model1_align`` rows).
    ``_align_concept_space`` is retained as an equal-output alternative
    (pinned by tests/test_model1.py) in case a regime with Tt >> 32 ever
    appears.
    """
    return _align_dense(params, corpus)


def _align_concept_space(params: Model1Params, corpus: Corpus) -> jax.Array:
    """Decode in CONCEPT-VOCABULARY space, the same structural lever as
    the EM sufficient statistics: because t(f|e) depends on the target only
    through its concept id, argmax_k logp[n,t,k] = (max over the
    utterance's PRESENT concepts of rows[n,t,e], then the first k whose
    concept attains that max).  That replaces the per-lane column select
    (core/counts.select_columns — K = 1+Tt masked VPU passes over
    [N,Ts,E], the floor of the one-hot pipeline, PERFORMANCE.md rule 7)
    with one [N,Ts,E] max + ONE MXU contraction of a 0/1 attains-max
    indicator against the target one-hots.  Tie semantics match the dense
    decode exactly (first target position attaining the max — bit-equality
    against the max value, so duplicated/smoothing-tied concept columns
    resolve identically; pinned vs ``_align_dense`` and the float64 oracle
    by tests/test_model1.py).
    """
    hi = jax.lax.Precision.HIGHEST
    f, e = params.log_t.shape
    rows = jnp.einsum(
        "ntf,fe->nte", jax.nn.one_hot(corpus.src, f, dtype=params.log_t.dtype),
        params.log_t, precision=hi,
    )  # [N, Ts, E]
    _, c = _count_stats(corpus, dtype=params.log_t.dtype)  # [N, E] multiplicity
    masked = jnp.where(c[:, None, :] > 0, rows, NEG_INF)
    m = jnp.max(masked, axis=-1, keepdims=True)  # [N, Ts, 1]
    attains = (masked >= m).astype(params.log_t.dtype)  # [N, Ts, E] 0/1
    trg_ext, ext_mask = _extended_targets(corpus)
    trg_oh = jax.nn.one_hot(trg_ext, e, dtype=params.log_t.dtype)  # [N, K, E]
    hit = jnp.einsum("nte,nke->ntk", attains, trg_oh, precision=hi) > 0.5
    hit = hit & ext_mask[:, None, :]
    a = jnp.argmax(hit, axis=-1).astype(jnp.int32)  # first k attaining max
    return jnp.where(corpus.src_mask(), a, 0)


def _align_dense(params: Model1Params, corpus: Corpus) -> jax.Array:
    """Dense decode: argmax over the materialized [N, Ts, 1+Tt] pair
    log-probs — the production path for sparse targets (see ``align``) and
    the test oracle for the concept-space formulation."""
    logp, _ = _pair_logprobs(params, corpus)
    a = jnp.argmax(logp, axis=-1).astype(jnp.int32)
    return jnp.where(corpus.src_mask(), a, 0)


def train(
    params: Model1Params,
    corpus: Corpus,
    num_iterations: int,
    smoothing: float = 1e-8,
) -> tuple[Model1Params, jax.Array]:
    """Run ``num_iterations`` EM steps under one lax.scan (trainUsingEM).

    Returns (params, logliks [num_iterations]).
    """

    def body(p, _):
        p2, stats = em_step(p, corpus, smoothing=smoothing)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
