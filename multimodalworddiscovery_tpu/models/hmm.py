"""Discrete HMM aligner: multinomial emissions over the phone vocabulary.

Reference counterpart: the discrete HMM word discoverer (SURVEY.md §2 C6) —
states are the paired image's concepts, emissions multinomial over phones,
transitions Vogel-style jump-width weights, trained with per-utterance
forward-backward EM and decoded with Viterbi.  Here one EM step is a single
jitted call: batched fwd-bwd scans (hmm_core) + one segment_sum for emission
counts + one projection onto jump widths for transition counts.

M-step follows the standard Vogel reestimation: jump weights are pooled
expected jump counts (row-normalization happens at use time), emissions are
normalized expected (phone, concept) counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from multimodalworddiscovery_tpu.core.counts import pair_counts, table_lookup
from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF, masked_logsumexp
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm_core


@struct.dataclass
class HMMParams:
    """log emission table [V_src, V_trg] (col 0 = NULL concept), unnormalized
    log jump weights [2*max_jump+1], scalar log null weight."""

    log_emit: jax.Array
    log_jump: jax.Array
    log_p0: jax.Array
    max_jump: int = struct.field(pytree_node=False, default=3)


def init(corpus: Corpus, max_jump: int = 3, dtype=jnp.float32) -> HMMParams:
    v_src, v_trg = corpus.src_vocab, corpus.trg_vocab
    w = 2 * max_jump + 1
    return HMMParams(
        log_emit=jnp.full((v_src, v_trg), -jnp.log(v_src), dtype=dtype),
        # mild preference for +1 jumps breaks the uniform-EM symmetry the way
        # the reference's distance-penalized init does
        log_jump=(-0.5 * jnp.abs(jnp.arange(w, dtype=dtype) - max_jump - 1)),
        log_p0=jnp.asarray(jnp.log(0.2), dtype=dtype),
        max_jump=max_jump,
    )


def _log_emissions(params: HMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, S]: log p(phone at t | state s).

    MXU table lookup instead of a double gather — the gather formulation was
    profiled at 23 of 26 ms per EM iteration on TPU (core/counts.py).
    """
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    return table_lookup(params.log_emit, corpus.src, concepts)


def _machinery(params: HMMParams, corpus: Corpus):
    log_trans = hmm_core.build_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    log_emit = _log_emissions(params, corpus)
    return log_init, log_trans, log_emit


def loglik(params: HMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def expected_counts(
    params: HMMParams,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
    """E-step only: ((emission counts [V,V], jump-width counts [W+2]), loglik).

    Counts are additive across corpus shards/buckets (exact bucketed EM).
    use_pallas=True routes the E-step through the fused Pallas kernel
    (ops/hmm_fwdbwd_pallas.py): forward, backward, posteriors, and pooled
    transition counts in one kernel pass instead of three XLA scans.
    """
    v_src, v_trg = params.log_emit.shape
    n, ts = corpus.src.shape
    tt_max = corpus.max_trg_len
    s = 2 * tt_max

    log_init, log_trans, log_emit = _machinery(params, corpus)
    width_ids = hmm_core.jump_width_ids(tt_max, params.max_jump)  # [S, S]
    w_total = 2 * params.max_jump + 3  # W jumps + p0 slot + impossible slot

    if use_pallas:
        from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
            estep_fits_vmem,
            hmm_estep_pallas,
        )

        if not interpret and not estep_fits_vmem(ts, s):
            # whole-block-resident kernel would OOM VMEM at this Ts*S;
            # the XLA scan path below handles any size
            use_pallas = False

    if use_pallas:
        from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import hmm_estep_pallas

        gamma_nts, xi_pooled, logz = hmm_estep_pallas(
            log_init, log_trans, log_emit, corpus.src_len, interpret=interpret
        )
        width_counts = jax.ops.segment_sum(
            xi_pooled.reshape(-1), width_ids.reshape(-1), num_segments=w_total
        )
    else:
        alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
        betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)

        smask = hmm_core.state_mask(corpus)  # [N, S]
        tmask = corpus.src_mask()  # [N, Ts]
        logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)

        # --- state posteriors gamma [Ts, N, S] ---
        log_gamma = alphas + betas - logz_safe[None, :, None]
        valid = tmask.T[:, :, None] & smask[None, :, :]
        gamma = jnp.where(valid, jnp.exp(log_gamma), 0.0)
        gamma_nts = jnp.moveaxis(gamma, 0, 1)

        def xi_step(acc, inputs):
            t, alpha_t, beta_next, emit_next = inputs
            # xi_t[n, s, s'] for the t -> t+1 transition
            logxi = (
                alpha_t[:, :, None]
                + log_trans
                + (emit_next + beta_next)[:, None, :]
                - logz_safe[:, None, None]
            )
            alive = ((t + 1) < corpus.src_len)[:, None, None]
            xi = jnp.where(alive, jnp.exp(jnp.minimum(logxi, 0.0)), 0.0)
            return acc + jnp.sum(xi, axis=0), None  # accumulate [S, S]

        emits = jnp.moveaxis(log_emit, 1, 0)  # [Ts, N, S]
        xi_pooled, _ = jax.lax.scan(
            xi_step,
            jnp.zeros((s, s), log_emit.dtype),
            (jnp.arange(ts - 1), alphas[:-1], betas[1:], emits[1:]),
        )
        # project onto jump widths ONCE (not one scatter per scan step)
        width_counts = jax.ops.segment_sum(
            xi_pooled.reshape(-1), width_ids.reshape(-1), num_segments=w_total
        )

    # --- emission counts as MXU one-hot matmuls (a flat segment_sum scatter
    # here measured 28 ms on TPU vs 1.6 ms for the matmul form) ---
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    emit_counts = pair_counts(gamma_nts, corpus.src, concepts, v_src, v_trg)
    return (emit_counts, width_counts), jnp.sum(logz)


def m_step(
    params: HMMParams,
    counts: tuple[jax.Array, jax.Array],
    smoothing: float = 1e-8,
) -> HMMParams:
    emit_counts, width_counts = counts
    emit_counts = emit_counts + smoothing
    new_log_emit = jnp.log(emit_counts) - jnp.log(
        jnp.sum(emit_counts, axis=0, keepdims=True)
    )
    W = 2 * params.max_jump + 1
    return HMMParams(
        log_emit=new_log_emit.astype(params.log_emit.dtype),
        log_jump=jnp.log(width_counts[:W] + smoothing).astype(params.log_jump.dtype),
        log_p0=jnp.log(width_counts[W] + smoothing).astype(params.log_p0.dtype),
        max_jump=params.max_jump,
    )


def em_step(
    params: HMMParams,
    corpus: Corpus,
    smoothing: float = 1e-8,
    use_pallas: bool = False,
    interpret: bool = False,
) -> tuple[HMMParams, dict[str, jax.Array]]:
    """One batched forward-backward EM iteration (SURVEY.md §3.2 🔥 replaced)."""
    counts, ll = expected_counts(params, corpus, use_pallas, interpret)
    return m_step(params, counts, smoothing), {"loglik": ll}


def align(params: HMMParams, corpus: Corpus) -> jax.Array:
    """Viterbi decode -> [N, Ts] alignment (0 = NULL, else 1-based trg pos)."""
    log_init, log_trans, log_emit = _machinery(params, corpus)
    path = hmm_core.viterbi(log_init, log_trans, log_emit, corpus.src_len)
    return hmm_core.path_to_alignment(path, corpus)


def posteriors(params: HMMParams, corpus: Corpus) -> jax.Array:
    """State posteriors [N, Ts, S] (for inspection/plotting)."""
    log_init, log_trans, log_emit = _machinery(params, corpus)
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    log_gamma = alphas + betas - logz_safe[None, :, None]
    gamma = jnp.exp(log_gamma)
    valid = corpus.src_mask().T[:, :, None] & hmm_core.state_mask(corpus)[None, :, :]
    return jnp.moveaxis(jnp.where(valid, gamma, 0.0), 0, 1)


def train(
    params: HMMParams, corpus: Corpus, num_iterations: int, smoothing: float = 1e-8
) -> tuple[HMMParams, jax.Array]:
    def body(p, _):
        p2, stats = em_step(p, corpus, smoothing=smoothing)
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
