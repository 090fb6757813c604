"""Discrete HMM aligner: multinomial emissions over the phone vocabulary.

Reference counterpart: the discrete HMM word discoverer (SURVEY.md §2 C6) —
states are the paired image's concepts, emissions multinomial over phones,
transitions Vogel-style jump-width weights, trained with per-utterance
forward-backward EM and decoded with Viterbi.  Here one EM step is a single
jitted call: batched fwd-bwd scans (hmm_core) + one-hot MXU matmuls for the
emission counts (core/counts.py — measured 17x over segment_sum scatters on
TPU) + one projection onto jump widths for transition counts.

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
    if corpus.src.ndim != 2:
        raise ValueError(
            "the discrete HMM's emissions are multinomial over token ids "
            f"(src must be [N, Ts], got {corpus.src.shape}); quantize frames "
            "first — frontend.vq / model.vq_frontend=true — or use "
            "hmm_gaussian / hmm_dnn for continuous emissions"
        )
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


def _log_emissions(
    params: HMMParams, corpus: Corpus, concepts: jax.Array | None = None
) -> jax.Array:
    """[N, Ts, S]: log p(phone at t | state s).

    MXU table lookup instead of a double gather — the gather formulation was
    profiled at 23 of 26 ms per EM iteration on TPU (core/counts.py).
    Pass ``concepts`` (hmm_core.state_concepts) to reuse a precomputed map.
    """
    if concepts is None:
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
    dot_dtype: str = "float32",
) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
    """E-step only: ((emission counts [V,V], jump-width counts [W+2]), loglik).

    Counts are additive across corpus shards/buckets (exact bucketed EM).
    use_pallas=True routes the E-step through the fused time-chunked Pallas
    kernel (hmm_core.estep -> ops/hmm_fwdbwd_pallas.py); when the state
    space and vocabularies also fit the count kernels' regime, the WHOLE
    step — emission lookup, forward-backward, pair counts — runs lane-major
    through three chained Pallas kernels with no [*, S, N]-sized XLA
    round-trips (``_expected_counts_fused``; measured 1.9 -> ~1.2 ms/EM
    iteration at the bench shape).
    """
    v_src, v_trg = params.log_emit.shape
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    s = concepts.shape[1]
    if (
        use_pallas
        and s <= 64
        and v_src <= 128
        and v_trg <= 256
    ):
        return _expected_counts_fused(
            params, corpus, concepts, interpret=interpret,
            dot_dtype=dot_dtype,
        )
    log_emit = _log_emissions(params, corpus, concepts)
    gamma_nts, width_counts, logz = hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, log_emit, corpus,
        use_pallas=use_pallas, interpret=interpret, dot_dtype=dot_dtype,
    )
    # --- emission counts as MXU one-hot matmuls (a flat segment_sum scatter
    # here measured 28 ms on TPU vs 1.6 ms for the matmul form) ---
    emit_counts = pair_counts(gamma_nts, corpus.src, concepts, v_src, v_trg)
    return (emit_counts, width_counts), jnp.sum(logz)


def _expected_counts_fused(
    params: HMMParams,
    corpus: Corpus,
    concepts: jax.Array,  # [N, S]
    interpret: bool = False,
    dot_dtype: str = "float32",
) -> tuple[tuple[jax.Array, jax.Array], jax.Array]:
    """Fully-fused Pallas E-step: lookup -> fwd-bwd -> counts, lane-major.

    The three kernels share one padded [T, S, N] layout, so the emission
    table values and gamma never exist in [N, T, S] form on HBM; the only
    XLA work left is the small [N, S]-sized factored-transition terms and
    the time-major int paddings (loop-invariant: XLA hoists them out of a
    training scan).
    """
    from multimodalworddiscovery_tpu.ops.counts_pallas import (
        pad_time_major,
        table_lookup_pallas,
    )
    from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
        _round_up,
        hmm_estep_counts_pallas,
        pick_tiles_fused,
    )

    v_src, v_trg = params.log_emit.shape
    n, ts = corpus.src.shape
    s = concepts.shape[1]
    bn, tc = pick_tiles_fused(
        ts, s, n, _round_up(v_src, 8), _round_up(v_trg, 8),
        n_real=corpus.max_trg_len,
    )
    bt = min(tc, 8)  # ts_pad is a multiple of tc, hence of bt
    s_pad = _round_up(s, 8)
    n_pad = _round_up(n, bn)
    ts_pad = _round_up(ts, tc)

    src_t = pad_time_major(corpus.src, ts_pad, n_pad)
    conc_t = pad_time_major(concepts, s_pad, n_pad)
    # static NULL-state flags (hmm_core.state_positions: s >= Tt_max is
    # null, concept id 0 on every lane) — halves the kernels' per-k
    # masked-select work; padded rows ride the same cheap path (gamma 0)
    null_rows = tuple(k >= corpus.max_trg_len for k in range(s_pad))
    emit_t = table_lookup_pallas(
        params.log_emit, src_t, conc_t, k_real=s,
        block_n=bn, block_t=bt, null_rows=null_rows, interpret=interpret,
    )
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    # backward kernel consumes each step's posteriors in VMEM and emits the
    # pooled (phone, concept) counts directly — gamma never exists on HBM
    emit_counts, xi_pooled, logz = hmm_estep_counts_pallas(
        log_init, base, rowz, colmask, emit_t, src_t, conc_t,
        corpus.src_len, n_rows=v_src, n_cols=v_trg,
        block_n=bn, chunk_t=tc, dot_dtype=dot_dtype, null_rows=null_rows,
        interpret=interpret, dims=(n, ts, s),
    )
    width_counts = hmm_core.project_widths(
        xi_pooled, corpus.max_trg_len, params.max_jump
    )
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
    dot_dtype: str = "float32",
) -> tuple[HMMParams, dict[str, jax.Array]]:
    """One batched forward-backward EM iteration (SURVEY.md §3.2 🔥 replaced)."""
    counts, ll = expected_counts(params, corpus, use_pallas, interpret, dot_dtype)
    return m_step(params, counts, smoothing), {"loglik": ll}


def align(
    params: HMMParams, corpus: Corpus, use_pallas: bool = False
) -> jax.Array:
    """Viterbi decode -> [N, Ts] alignment (0 = NULL, else 1-based trg pos).

    Uses the factored-transition decoder (hmm_core.viterbi_factored): no
    [N, S, S] transition tensor, int8 backpointers — decode stays
    memory-light at corpus scale.  use_pallas routes through the fused
    decode kernel (ops/viterbi_pallas.py)."""
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    log_emit = _log_emissions(params, corpus)
    path = hmm_core.viterbi_factored(
        log_init, base, rowz, colmask, log_emit, corpus.src_len,
        use_pallas=use_pallas,
    )
    return hmm_core.path_to_alignment(path, corpus)


def posteriors(params: HMMParams, corpus: Corpus) -> jax.Array:
    """State posteriors [N, Ts, S] (for inspection/plotting/guides)."""
    log_init, log_trans, log_emit = _machinery(params, corpus)
    return hmm_core.posteriors_from(log_init, log_trans, log_emit, corpus)


def train(
    params: HMMParams,
    corpus: Corpus,
    num_iterations: int,
    smoothing: float = 1e-8,
    use_pallas: bool = False,
    dot_dtype: str = "float32",
) -> tuple[HMMParams, jax.Array]:
    def body(p, _):
        p2, stats = em_step(
            p, corpus, smoothing=smoothing, use_pallas=use_pallas,
            dot_dtype=dot_dtype,
        )
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, None, length=num_iterations)
