"""Gaussian / GMM-emission HMM aligner: continuous acoustic frames.

Reference counterpart: the Gaussian-mixture HMM variant of the 2020
DNN-HMM-DNN paper (SURVEY.md §2 C7) — same Vogel alignment skeleton as the
discrete HMM but emissions are per-concept diagonal Gaussian MIXTURES over
MFCC-style frames (n_components=1 recovers the single-Gaussian model; words
spanning several phones need the mixture).

TPU-first emission computation: all (concept, component) log-densities come
from two MXU matmuls over the flattened [C*K, D] parameter matrices,

  log N(x | mu, diag(var)) = x^2 @ (-.5/var).T + x @ (mu/var).T + const,

then a logsumexp over components with the mixture weights.  M-step sufficient
statistics are the transposed einsums of the combined (HMM gamma x component
responsibility) posteriors — no scatters anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from multimodalworddiscovery_tpu.core.logsemiring import masked_logsumexp
from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models import hmm_core

_LOG_2PI = 1.8378770664093453


@struct.dataclass
class GaussianHMMParams:
    """Diagonal-GMM emissions per concept + Vogel transitions.

    means/log_vars: [C, K, D]; log_mix: [C, K] (log mixture weights).
    """

    means: jax.Array
    log_vars: jax.Array
    log_mix: jax.Array
    log_jump: jax.Array  # [2*max_jump+1]
    log_p0: jax.Array  # scalar
    max_jump: int = struct.field(pytree_node=False, default=3)


def feature_shift(corpus: Corpus, dtype=jnp.float32) -> jax.Array:
    """Masked per-dim feature mean of (a shard of) the corpus — the shift
    point for ``init_moments``' squared sums.  Any shard's mean works; it
    only needs to be CLOSE to the corpus mean (and identical across shards
    of one run)."""
    mask = corpus.src_mask()[..., None]
    xm = jnp.where(mask, corpus.src, 0.0).astype(dtype)
    return jnp.sum(xm, axis=(0, 1)) / jnp.maximum(jnp.sum(mask.astype(dtype)), 1.0)


def init_moments(
    corpus: Corpus, shift: jax.Array | float = 0.0, dtype=jnp.float32,
    with_diagonal: bool = True,
) -> dict[str, jax.Array]:
    """ADDITIVE seeding statistics — summable across corpus shards, so the
    streamed CLI can seed `init`/`init_diagonal` from the WHOLE corpus
    instead of shard 0 (data/stream.tree_sum_bounded over per-shard calls):

      fsum [D], fcnt []      raw global feature sums / count
      fsq [D]                sum of (x - shift)^2 — squared sums are taken
                             about ``shift`` (pass a ``feature_shift``!):
                             a raw one-pass E[x^2]-mean^2 catastrophically
                             cancels in float32 for features with
                             |mean|/std beyond ~1e3 (var clamps to 0, zero
                             jitter, degenerate seeding).  With
                             shift ~= mean this is the stable two-pass
                             variance.  Use the SAME shift for every shard.
      csum [E,D], ccnt [E]   per-concept raw sums under the uniform
                             DIAGONAL alignment (slot j = floor(t*Tt/Ts)) —
                             the flat-start evidence ``init_diagonal`` uses.
                             ``with_diagonal=False`` skips the [N,Ts,E]
                             one-hot contraction that produces them (returns
                             zeros of the same shapes, so the pytree
                             structure — and shard-summability — is
                             unchanged): mode="global" seeding never reads
                             them, and the contraction's peak memory scales
                             with trg_vocab.
    """
    x = corpus.src  # [N, Ts, D]
    mask = corpus.src_mask()[..., None]
    xm = jnp.where(mask, x, 0.0).astype(dtype)
    xc = jnp.where(mask, x - shift, 0.0).astype(dtype)
    hi = jax.lax.Precision.HIGHEST

    d = x.shape[-1]
    if with_diagonal:
        t_idx = jnp.arange(corpus.max_src_len)[None, :]
        slen = jnp.maximum(corpus.src_len[:, None], 1)
        slot = (t_idx * corpus.trg_len[:, None]) // slen
        slot = jnp.clip(slot, 0, jnp.maximum(corpus.trg_len[:, None] - 1, 0))
        concept = jnp.take_along_axis(corpus.trg, slot, axis=1)  # [N, Ts]
        oh = jax.nn.one_hot(concept, corpus.trg_vocab, dtype=dtype)
        oh = oh * corpus.src_mask().astype(dtype)[:, :, None]  # [N, Ts, E]
        csum = jnp.einsum("nte,ntd->ed", oh, xm, precision=hi)
        ccnt = jnp.sum(oh, axis=(0, 1))
    else:
        csum = jnp.zeros((corpus.trg_vocab, d), dtype)
        ccnt = jnp.zeros((corpus.trg_vocab,), dtype)
    return {
        "fsum": jnp.sum(xm, axis=(0, 1)),
        "fsq": jnp.sum(xc * xc, axis=(0, 1)),
        "fcnt": jnp.sum(mask.astype(dtype)),
        "csum": csum,
        "ccnt": ccnt,
    }


def init_from_moments(
    moments: dict[str, jax.Array],
    max_jump: int = 3,
    n_components: int = 1,
    key: jax.Array | None = None,
    mode: str = "global",
    shift: jax.Array | float = 0.0,
    dtype=jnp.float32,
) -> GaussianHMMParams:
    """Build params from (possibly shard-summed) ``init_moments``.

    ``shift`` must be the value the moments were taken with.  mode="global"
    mirrors ``init`` (corpus mean + jitter), mode="diagonal" mirrors
    ``init_diagonal`` (per-concept diagonal flat-start means)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    v_trg, d = moments["csum"].shape
    total = jnp.maximum(moments["fcnt"], 1.0)
    mean = moments["fsum"] / total
    # E[(x-shift)^2] - (mean-shift)^2: exact two-pass variance when
    # shift == mean, and numerically stable whenever shift ~= mean
    var = jnp.maximum(moments["fsq"] / total - (mean - shift) ** 2, 0.0)
    # 0.1x concept jitter (K=1-stable); extra spread only across components
    k1, k2 = jax.random.split(key)
    jitter = 0.1 * jnp.sqrt(var) * jax.random.normal(k1, (v_trg, 1, d), dtype)
    if n_components > 1:
        jitter = jitter + 0.3 * jnp.sqrt(var) * jax.random.normal(
            k2, (v_trg, n_components, d), dtype
        )
    else:
        jitter = jnp.broadcast_to(jitter, (v_trg, n_components, d))
    w = 2 * max_jump + 1
    params = GaussianHMMParams(
        means=(mean[None, None, :] + jitter).astype(dtype),
        log_vars=jnp.broadcast_to(
            jnp.log(var + 1e-6), (v_trg, n_components, d)
        ).astype(dtype),
        log_mix=jnp.full((v_trg, n_components), -jnp.log(n_components), dtype),
        log_jump=(-0.5 * jnp.abs(jnp.arange(w, dtype=dtype) - max_jump - 1)),
        log_p0=jnp.asarray(jnp.log(0.2), dtype=dtype),
        max_jump=max_jump,
    )
    if mode == "global":
        return params
    if mode != "diagonal":
        raise ValueError(f"mode must be global|diagonal, got {mode!r}")
    seen = moments["ccnt"] > 0
    cmean = moments["csum"] / jnp.maximum(moments["ccnt"], 1.0)[:, None]
    # unseen concepts keep the global-mean fallback
    means = jnp.where(seen[:, None, None], cmean[:, None, :], params.means)
    if n_components > 1:
        k2 = jax.random.fold_in(key, 1)
        means = means + 0.3 * jnp.sqrt(var) * jax.random.normal(
            k2, (v_trg, n_components, d), dtype
        )
    return params.replace(means=means.astype(dtype))


def init(
    corpus: Corpus,
    max_jump: int = 3,
    n_components: int = 1,
    key: jax.Array | None = None,
    dtype=jnp.float32,
) -> GaussianHMMParams:
    """Means = corpus mean + per-(concept, component) jitter, vars = corpus var."""
    shift = feature_shift(corpus, dtype)  # exact two-pass variance
    return init_from_moments(
        init_moments(corpus, shift, dtype, with_diagonal=False),
        max_jump=max_jump,
        n_components=n_components, key=key, mode="global", shift=shift,
        dtype=dtype,
    )


def init_diagonal(
    corpus: Corpus,
    max_jump: int = 3,
    n_components: int = 1,
    key: jax.Array | None = None,
    dtype=jnp.float32,
) -> GaussianHMMParams:
    """Flat-start from the uniform DIAGONAL alignment (speech-style).

    The global-mean-plus-jitter ``init`` is symmetric across concepts; EM
    breaks the symmetry fine at ~6 concepts/utterance but collapses at
    dense-region scale (measured: 200 concepts, 16-32/image — frame acc
    plateaus at ~0.10).  Seeding each concept's mean from the frames the
    uniform diagonal segmentation assigns to it (slot j = floor(t·Tt/Ts),
    the classic HMM flat-start) breaks the symmetry with corpus evidence:
    same shapes, one one-hot MXU contraction, no alignment model needed.
    """
    shift = feature_shift(corpus, dtype)
    return init_from_moments(
        init_moments(corpus, shift, dtype), max_jump=max_jump,
        n_components=n_components, key=key, mode="diagonal", shift=shift,
        dtype=dtype,
    )


def _component_logdensity(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, C, K] per-component log-densities via two MXU matmuls."""
    x = corpus.src  # [N, Ts, D]
    c, k, d = params.means.shape
    means = params.means.reshape(c * k, d)
    log_vars = params.log_vars.reshape(c * k, d)
    inv_var = jnp.exp(-log_vars)
    const = -0.5 * (
        jnp.sum(log_vars, axis=-1)
        + jnp.sum(means**2 * inv_var, axis=-1)
        + d * _LOG_2PI
    )  # [C*K]
    a = jnp.einsum("ntd,md->ntm", x, means * inv_var)
    b = jnp.einsum("ntd,md->ntm", x**2, 0.5 * inv_var)
    return (a - b + const[None, None, :]).reshape(*x.shape[:2], c, k)


def _concept_logdensity(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, C] log p(x_t | concept c) = logsumexp_k(log w_ck + log N_ck)."""
    comp = _component_logdensity(params, corpus)  # [N, Ts, C, K]
    logw = jax.nn.log_softmax(params.log_mix, axis=-1)
    return masked_logsumexp(comp + logw[None, None, :, :], axis=-1)


def _log_emissions(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    """[N, Ts, S] state emission log-probs (MXU column select, not a gather)."""
    from multimodalworddiscovery_tpu.core.counts import select_columns

    logb = _concept_logdensity(params, corpus)  # [N, Ts, C]
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    return select_columns(logb, concepts)


def _machinery(params: GaussianHMMParams, corpus: Corpus):
    log_trans = hmm_core.build_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    return log_init, log_trans, _log_emissions(params, corpus)


def loglik(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    _, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    return jnp.sum(logz)


def expected_counts(
    params: GaussianHMMParams,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
    emit_scale: float = 1.0,
) -> tuple[dict[str, jax.Array], jax.Array]:
    """E-step sufficient statistics — ALL additive across corpus shards or
    length buckets (exact bucketed / data-parallel EM):

      c0 [C,K], c1/c2 [C,K,D]   combined (gamma x responsibility) moments
      width [W+2]               expected jump counts
      fsum/fsq [D], fcnt []     global feature moments (for the var floor)

    emit_scale < 1 runs a deterministic-annealing E-step (emission
    log-likelihoods scaled by beta; ``train``'s ``anneal`` ramps it).
    """
    v_trg = corpus.trg_vocab

    log_emit = _log_emissions(params, corpus)
    if isinstance(emit_scale, jax.Array) or emit_scale != 1.0:
        # deterministic annealing: beta < 1 flattens the emission likelihood
        # (p(x|s)^beta), softening early posteriors so EM explores concept
        # assignments before committing — the dense-region regime's failure
        # mode is premature hard assignment under the flat-start init
        log_emit = jnp.asarray(emit_scale, log_emit.dtype) * log_emit
    gamma, width_counts, logz = hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, log_emit, corpus,
        use_pallas=use_pallas, interpret=interpret, dot_dtype=dot_dtype,
    )  # gamma [N, Ts, S]

    # Pool state posteriors onto concept ids: r [N, Ts, C]
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    onehot = jax.nn.one_hot(concepts, v_trg, dtype=gamma.dtype)  # [N, S, C]
    r = jnp.einsum("nts,nsc->ntc", gamma, onehot)

    # Component responsibilities within each concept, combined with r
    comp = _component_logdensity(params, corpus)  # [N, Ts, C, K]
    logw = jax.nn.log_softmax(params.log_mix, axis=-1)
    u = jax.nn.softmax(comp + logw[None, None, :, :], axis=-1)
    comb = r[..., None] * u  # [N, Ts, C, K]

    # Gaussian sufficient statistics (MXU matmuls over the whole corpus)
    x = corpus.src
    tmask = corpus.src_mask()
    w_feat = tmask.astype(x.dtype)[..., None]
    counts = {
        "c0": jnp.sum(comb, axis=(0, 1)),  # [C, K]
        "c1": jnp.einsum("ntck,ntd->ckd", comb, x),
        "c2": jnp.einsum("ntck,ntd->ckd", comb, x**2),
        "width": width_counts,
        "fsum": jnp.sum(x * w_feat, axis=(0, 1)),
        "fsq": jnp.sum(x**2 * w_feat, axis=(0, 1)),
        "fcnt": jnp.sum(w_feat),
    }
    return counts, jnp.sum(logz)


def m_step(
    params: GaussianHMMParams,
    counts: dict[str, jax.Array],
    smoothing: float = 1e-6,
    var_floor: float = 1e-4,
    var_floor_rel: float = 1e-3,
) -> GaussianHMMParams:
    """Variances are floored at max(var_floor, var_floor_rel * global feature
    variance) per dimension — near-noiseless data otherwise collapses
    components onto single frames (observed on synthetic tones:
    log-likelihood exploding to +5e9)."""
    c0 = counts["c0"] + smoothing
    new_means = counts["c1"] / c0[..., None]
    tot = jnp.maximum(counts["fcnt"], 1.0)
    gmean = counts["fsum"] / tot
    gvar = counts["fsq"] / tot - gmean**2  # [D]
    floor = jnp.maximum(var_floor, var_floor_rel * gvar)[None, None, :]
    new_vars = jnp.maximum(counts["c2"] / c0[..., None] - new_means**2, floor)
    new_log_mix = jnp.log(c0) - jnp.log(jnp.sum(c0, axis=-1, keepdims=True))
    width_counts = counts["width"]
    W = 2 * params.max_jump + 1
    return GaussianHMMParams(
        means=new_means.astype(params.means.dtype),
        log_vars=jnp.log(new_vars).astype(params.log_vars.dtype),
        log_mix=new_log_mix.astype(params.log_mix.dtype),
        log_jump=jnp.log(width_counts[:W] + smoothing).astype(params.log_jump.dtype),
        log_p0=jnp.log(width_counts[W] + smoothing).astype(params.log_p0.dtype),
        max_jump=params.max_jump,
    )


def em_step(
    params: GaussianHMMParams,
    corpus: Corpus,
    smoothing: float = 1e-6,
    var_floor: float = 1e-4,
    var_floor_rel: float = 1e-3,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
    emit_scale: float | jax.Array = 1.0,
) -> tuple[GaussianHMMParams, dict[str, jax.Array]]:
    """One EM iteration (expected_counts + m_step).  ``emit_scale`` < 1 is
    the deterministic-annealing temperature (see ``expected_counts``)."""
    counts, ll = expected_counts(
        params, corpus, use_pallas=use_pallas, interpret=interpret,
        dot_dtype=dot_dtype, emit_scale=emit_scale,
    )
    new_params = m_step(params, counts, smoothing, var_floor, var_floor_rel)
    return new_params, {"loglik": ll}


def align(
    params: GaussianHMMParams, corpus: Corpus, use_pallas: bool = False
) -> jax.Array:
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    path = hmm_core.viterbi_factored(
        log_init, base, rowz, colmask, _log_emissions(params, corpus),
        corpus.src_len, use_pallas=use_pallas,
    )
    return hmm_core.path_to_alignment(path, corpus)


def posteriors(params: GaussianHMMParams, corpus: Corpus) -> jax.Array:
    log_init, log_trans, log_emit = _machinery(params, corpus)
    return hmm_core.posteriors_from(log_init, log_trans, log_emit, corpus)


def train(
    params: GaussianHMMParams,
    corpus: Corpus,
    num_iterations: int,
    use_pallas: bool = False,
    dot_dtype: str = "float32",
    anneal: tuple[float, int] | None = None,
) -> tuple[GaussianHMMParams, jax.Array]:
    """EM under one lax.scan.  ``anneal=(beta0, n_ramp)`` runs deterministic
    annealing: the emission temperature ramps linearly beta0 -> 1 over the
    first n_ramp iterations (then exact EM) — measured on the dense-region
    stretch regime in docs/PERFORMANCE.md."""
    if anneal is None:
        scales = jnp.ones((num_iterations,), jnp.float32)
    else:
        beta0, n_ramp = anneal
        ramp = jnp.linspace(beta0, 1.0, max(n_ramp, 1))
        scales = jnp.concatenate(
            [ramp, jnp.ones((max(num_iterations - n_ramp, 0),), jnp.float32)]
        )[:num_iterations]

    def body(p, scale):
        p2, stats = em_step(
            p, corpus, use_pallas=use_pallas, dot_dtype=dot_dtype,
            emit_scale=scale,
        )
        return p2, stats["loglik"]

    return jax.lax.scan(body, params, scales)


def counts_from_responsibilities(
    params: GaussianHMMParams,
    corpus: Corpus,
    r: jax.Array,      # [N, Ts, C] concept responsibilities (masked frames 0)
    width: jax.Array,  # [2*max_jump+3] jump-width counts to pass through
) -> dict[str, jax.Array]:
    """``expected_counts``-shaped sufficient statistics with an EXTERNAL
    concept responsibility (gold one-hots for the oracle ceiling, a discrete
    teacher's posteriors for VQ seeding, ...).  Component responsibilities
    still come from ``params``, so iterating (this -> m_step) is per-concept
    GMM EM with the concept assignment pinned."""
    comp = _component_logdensity(params, corpus)  # [N, Ts, C, K]
    logw = jax.nn.log_softmax(params.log_mix, axis=-1)
    u = jax.nn.softmax(comp + logw[None, None, :, :], axis=-1)
    comb = r[..., None] * u

    x = corpus.src
    w_feat = corpus.src_mask().astype(x.dtype)[..., None]
    return {
        "c0": jnp.sum(comb, axis=(0, 1)),
        "c1": jnp.einsum("ntck,ntd->ckd", comb, x),
        "c2": jnp.einsum("ntck,ntd->ckd", comb, x**2),
        "width": width,
        "fsum": jnp.sum(x * w_feat, axis=(0, 1)),
        "fsq": jnp.sum(x**2 * w_feat, axis=(0, 1)),
        "fcnt": jnp.sum(w_feat),
    }


def supervised_counts(
    params: GaussianHMMParams, corpus: Corpus, gold_alignment: jax.Array
) -> dict[str, jax.Array]:
    """Oracle-assignment E-step: the same sufficient statistics as
    ``expected_counts`` but with the state posterior replaced by the GOLD
    frame alignment (one-hot on the aligned concept; NULL frames feed the
    NULL concept).  ``m_step`` on these counts gives the emission family's
    REPRESENTATIONAL CEILING for a corpus — decode accuracy under it bounds
    what any EM/init/annealing scheme could reach, separating task bound
    from optimization failure (dense-region study, docs/PERFORMANCE.md).

    gold_alignment: [N, Ts] int (0 = NULL, else 1-based target position).
    """
    v_trg = corpus.trg_vocab
    a = gold_alignment
    tmask = corpus.src_mask()
    pos = jnp.clip(a - 1, 0, corpus.max_trg_len - 1)
    conc = jnp.take_along_axis(corpus.trg, pos, axis=1)  # [N, Ts]
    conc = jnp.where(a > 0, conc, 0)  # NULL frames -> NULL concept
    r = jax.nn.one_hot(conc, v_trg, dtype=params.means.dtype)
    r = r * tmask.astype(r.dtype)[..., None]  # [N, Ts, C]

    # gold jump-width counts.  A NULL state holds its predecessor's
    # underlying position (hmm_core.jump_width_ids: null entries are
    # same-pos only), so a null(pos i)->real(j) gold transition is a
    # legal width-(j-i) jump chargeable to log_jump — forward-fill the
    # last REAL position through NULL runs instead of binning those
    # resumptions as 'impossible' (W+1), which silently dropped every
    # post-NULL jump from the supervised transition fit.
    both = tmask[:, 1:] & tmask[:, :-1]
    mj = params.max_jump
    W = 2 * mj + 1
    tpos = jnp.arange(a.shape[1])[None, :]
    seen = jax.lax.cummax(jnp.where(a > 0, tpos, -1), axis=1)
    last_real = jnp.take_along_axis(a, jnp.clip(seen, 0, None), axis=1)
    from_pos = last_real[:, :-1]
    has_from = seen[:, :-1] >= 0  # leading-NULL runs have no source position
    w_id = jnp.clip(a[:, 1:] - from_pos, -mj, mj) + mj
    w_id = jnp.where(
        both & (a[:, 1:] > 0),
        jnp.where(has_from, w_id, W + 1),
        jnp.where(both & (a[:, 1:] == 0), W, W + 1),
    )
    width = jax.ops.segment_sum(
        jnp.ones_like(w_id.reshape(-1), params.means.dtype)
        * both.reshape(-1).astype(params.means.dtype),
        w_id.reshape(-1), num_segments=W + 2,
    )
    return counts_from_responsibilities(params, corpus, r, width)


def supervised_fit(
    params: GaussianHMMParams,
    corpus: Corpus,
    gold_alignment: jax.Array,
    num_iterations: int = 5,
) -> GaussianHMMParams:
    """Supervised GMM fit from gold alignments (the oracle ceiling model):
    iterate (supervised_counts -> m_step); gamma stays pinned to gold while
    the per-concept mixture components converge."""
    def body(p, _):
        counts = supervised_counts(p, corpus, gold_alignment)
        return m_step(p, counts), None

    out, _ = jax.lax.scan(body, params, None, length=num_iterations)
    return out


def teacher_responsibilities(teacher_gamma: jax.Array, corpus: Corpus) -> jax.Array:
    """Pool a (discrete-HMM) teacher's state posteriors [N, Ts, S] onto
    concept responsibilities [N, Ts, C] (the VQ-teacher seeding path of the
    dense-region study: scripts/exp_gauss_dense.py)."""
    concepts = hmm_core.state_concepts(corpus)  # [N, S]
    onehot = jax.nn.one_hot(concepts, corpus.trg_vocab, dtype=teacher_gamma.dtype)
    return jnp.einsum("nts,nsc->ntc", teacher_gamma, onehot)


def _kmeans_assign(cb: jax.Array, fl: jax.Array) -> jax.Array:
    """argmin_m ||x - c_m||^2 == argmin_m (|c_m|^2 - 2 x.c_m): one MXU matmul."""
    hi = jax.lax.Precision.HIGHEST
    score = (
        -2.0 * jnp.einsum("nd,md->nm", fl, cb, precision=hi)
        + jnp.sum(cb**2, axis=-1)[None, :]
    )
    return jnp.argmin(score, axis=-1)


@functools.partial(jax.jit, static_argnames=("n_codes", "num_iterations"))
def _kmeans_fit(cb0, flat, wflat, *, n_codes, num_iterations):
    """Lloyd's k-means sweeps over [NT, D] flat frames -> fitted codebook.

    Module-level jit with the frame matrix as an ARGUMENT: closed-over
    concrete arrays are baked into the lowered module as literals, and at
    corpus scale (N*Ts*D floats) the remote-compile request blows the TPU
    tunnel's body-size limit (HTTP 413 measured at the stretch shape).
    tests/test_hmm_gaussian.py pins the lowered-module size."""
    hi = jax.lax.Precision.HIGHEST

    def body(carry, _):
        cb, fl, wf = carry
        a = _kmeans_assign(cb, fl)
        oh = jax.nn.one_hot(a, n_codes, dtype=jnp.float32) * wf[:, None]
        sums = jnp.einsum("nm,nd->md", oh, fl, precision=hi)
        cnt = jnp.sum(oh, axis=0)
        # empty codes keep their old centroid (re-seeding would need
        # data-dependent choice; distinct-frame init makes this rare)
        cb = jnp.where(
            cnt[:, None] > 0, sums / jnp.maximum(cnt, 1.0)[:, None], cb
        )
        return (cb, fl, wf), None

    (cb, _, _), _ = jax.lax.scan(
        body, (cb0, flat, wflat), None, length=num_iterations
    )
    return cb


@functools.partial(jax.jit, static_argnames=("n_codes", "num_iterations"))
def _kmeans_codes(cb0, flat, wflat, *, n_codes, num_iterations):
    """Lloyd's sweeps + final assignment (see ``_kmeans_fit``)."""
    cb = _kmeans_fit(cb0, flat, wflat, n_codes=n_codes,
                     num_iterations=num_iterations)
    return _kmeans_assign(cb, flat)


def fit_frame_codebook(
    corpus: Corpus,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
) -> jax.Array:
    """THE resident codebook-fit protocol (single definition — shared by
    ``quantize_frames`` and ``frontend.vq.fit_codebook``): Lloyd's sweeps
    over the masked frames, init from n_codes distinct REAL frames
    (mask-weighted choice).  Refuses corpora with fewer real frames than
    codes: ``replace=False`` with a weighted p would otherwise backfill the
    draw with zero-probability PADDING frames (verified), seeding duplicate
    all-zero centroids that Lloyd's never re-seeds."""
    if key is None:
        key = jax.random.PRNGKey(0)
    x = corpus.src
    flat = x.reshape(-1, x.shape[-1])
    wflat = corpus.src_mask().reshape(-1).astype(jnp.float32)
    n_real = int(jnp.sum(wflat))
    if n_real < n_codes:
        raise ValueError(
            f"corpus has only {n_real} real frames < {n_codes} codes"
        )
    idx0 = jax.random.choice(
        key, flat.shape[0], (n_codes,), p=wflat / wflat.sum(), replace=False
    )
    return _kmeans_fit(
        flat[idx0], flat, wflat, n_codes=n_codes,
        num_iterations=num_iterations,
    )


def quantize_frames(
    corpus: Corpus,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
) -> Corpus:
    """Vector-quantize the frame corpus: Lloyd's k-means over the masked
    frames, then replace each frame with its code id.

    Returns the DISCRETE corpus (``src`` = int32 code ids, ``src_vocab`` =
    n_codes; targets/lengths unchanged) — the input a discrete-HMM teacher
    trains on in the VQ-teacher seeding recipe (``init_vq_teacher``).

    TPU notes: the assignment never materializes [N*Ts, M, D] —
    argmin ||x - c||^2 == argmin (|c|^2 - 2 x·c), one MXU matmul per sweep;
    the codebook update is a one-hot contraction (no scatters).  Codebook
    init draws n_codes distinct REAL frames (mask-weighted choice).
    """
    cb = fit_frame_codebook(
        corpus, n_codes=n_codes, num_iterations=num_iterations, key=key
    )
    x = corpus.src  # [N, Ts, D]
    codes = jax.jit(_kmeans_assign)(cb, x.reshape(-1, x.shape[-1]))
    return Corpus(
        src=codes.reshape(x.shape[:2]).astype(jnp.int32),
        src_len=corpus.src_len,
        trg=corpus.trg,
        trg_len=corpus.trg_len,
        src_vocab=n_codes,
        trg_vocab=corpus.trg_vocab,
    )


def init_vq_teacher(
    corpus: Corpus,
    max_jump: int = 3,
    n_components: int = 1,
    key: jax.Array | None = None,
    dtype=jnp.float32,
    *,
    n_codes: int = 64,
    teacher_iters: int = 10,
    seed_rounds: int = 3,
    use_pallas: bool = False,
    chunks: int = 1,
) -> GaussianHMMParams:
    """Seed the Gaussian HMM from a VQ + discrete-HMM teacher — the measured
    winner of the dense-region quality study (scripts/exp_gauss_dense.py;
    docs/PERFORMANCE.md):

      1. ``quantize_frames``: k-means codebook over frames -> code corpus;
      2. discrete-HMM EM on the code sequences (``models.hmm``) — the
         discrete aligner solves the dense-concept assignment problem that
         joint Gaussian EM cannot (0.370 vs 0.118 frame acc at 200 concepts,
         16-32 per image);
      3. ``seed_rounds`` rounds of (teacher-posterior responsibility counts
         -> ``m_step``): the Gaussian emission family is fit against the
         teacher's concept posteriors (pinned assignment, per-concept GMM EM);
      4. the teacher's learned transitions (log_jump/log_p0) are copied over.

    Follow with annealed EM (``train(anneal=...)``) for the full recipe:
    0.118 flat-start -> 0.418 vs a 0.519 supervised ceiling on the study
    corpus.  ``chunks`` > 1 bounds seeding activation memory exactly like
    ``train.corpus_chunks`` (per-chunk posteriors, additive counts).
    """
    from multimodalworddiscovery_tpu.models import hmm as dhmm

    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_vq = jax.random.split(key)
    base = init(
        corpus, max_jump=max_jump, n_components=n_components,
        key=k_init, dtype=dtype,
    )

    code_corpus = quantize_frames(corpus, n_codes=n_codes, key=k_vq)
    tp = dhmm.init(code_corpus, max_jump=max_jump)
    # code_corpus as a jit ARGUMENT (closure constants become compile-request
    # literals; see quantize_frames.run)
    tp, _ = jax.jit(
        lambda p, cc: dhmm.train(p, cc, teacher_iters, use_pallas=use_pallas)
    )(tp, code_corpus)

    return seed_from_teacher(
        base, corpus, code_corpus, tp, seed_rounds=seed_rounds, chunks=chunks
    )


def seed_from_teacher(
    base: GaussianHMMParams,
    corpus: Corpus,
    code_corpus: Corpus,
    teacher,
    seed_rounds: int = 3,
    chunks: int = 1,
) -> GaussianHMMParams:
    """Fit the Gaussian emission family against a discrete-HMM ``teacher``'s
    concept posteriors over ``code_corpus`` (``seed_rounds`` rounds of
    pinned-assignment GMM EM), then copy the teacher's transitions.  The
    seeding stage of ``init_vq_teacher``, exposed so studies/scripts can
    probe the teacher separately (scripts/exp_gauss_dense.py)."""
    from multimodalworddiscovery_tpu.models import hmm as dhmm

    nchunk = max(int(chunks), 1)
    csz = -(-corpus.n // nchunk)
    zero_w = jnp.zeros((2 * base.max_jump + 3,), base.means.dtype)

    @jax.jit
    def seed_counts_chunk(gp, tp, sub_fc, sub_cc):
        gamma = dhmm.posteriors(tp, sub_cc)  # [n, Ts, S]
        r = teacher_responsibilities(gamma, sub_fc)
        return counts_from_responsibilities(gp, sub_fc, r, zero_w)

    gp = base
    for _ in range(max(int(seed_rounds), 1)):
        total = None
        for i in range(nchunk):
            sl = slice(i * csz, (i + 1) * csz)
            sub_fc = jax.tree.map(lambda v: v[sl], corpus)
            sub_cc = jax.tree.map(lambda v: v[sl], code_corpus)
            cts = seed_counts_chunk(gp, teacher, sub_fc, sub_cc)
            total = cts if total is None else jax.tree.map(
                lambda a, b: a + b, total, cts
            )
        gp = m_step(gp, total)
    return gp.replace(log_jump=teacher.log_jump, log_p0=teacher.log_p0)


def _reservoir_frames(
    reader, n_sample: int, seed: int = 0, shards=None, return_keys: bool = False
):
    """Uniform sample of up to ``n_sample`` masked frames across shards of a
    ``data.stream.ShardedCorpusReader`` corpus, without materializing the
    frame matrix: every frame gets an iid uniform sort key and the n_sample
    smallest keys win (the random-sort-key reservoir — exactly uniform,
    single pass, O(n_sample + shard) host memory).

    Keys are drawn from a PER-SHARD derived rng (``default_rng([seed, k])``),
    and the result is returned in ASCENDING-KEY order — so the sample is a
    pure function of (corpus shards, seed), independent of which process
    scanned which shards or in what order.  That makes per-process partial
    reservoirs MERGEABLE: union the (key, frame) pairs, keep the n_sample
    smallest keys, sort — exactly what the single-process scan computes
    (parallel/multihost.reservoir_frames_multihost).

    ``shards``: iterable of shard indices to scan (default: all).
    Returns a [M, D] numpy array, M <= n_sample (plus the [M] keys when
    ``return_keys``)."""
    import numpy as np

    keys = buf = None
    for k in range(reader.num_shards) if shards is None else shards:
        rng = np.random.default_rng([seed, int(k)])
        src = np.load(reader.directory / f"src_{k}.npy", mmap_mode="r")
        slen = np.load(reader.directory / f"src_len_{k}.npy", mmap_mode="r")
        t = src.shape[1]
        mask = np.arange(t)[None, :] < np.asarray(slen)[:, None]
        # float32 canonically: float16-STORAGE shards must yield the same
        # reservoir dtype (and merge layout) as float32 shards
        flat = np.asarray(src)[mask].astype(np.float32, copy=False)
        u = rng.random(flat.shape[0])
        ck = u if keys is None else np.concatenate([keys, u])
        cb = flat if buf is None else np.concatenate([buf, flat])
        if ck.shape[0] > n_sample:
            top = np.argpartition(ck, n_sample - 1)[:n_sample]
            keys, buf = ck[top], cb[top]
        else:
            keys, buf = ck, cb
    if buf is None:  # a process past the last shard contributes nothing
        d = int(np.load(reader.directory / "src_0.npy", mmap_mode="r").shape[-1])
        keys, buf = np.zeros((0,)), np.zeros((0, d), np.float32)
    order = np.argsort(keys, kind="stable")
    keys, buf = keys[order], buf[order]
    return (buf, keys) if return_keys else buf


def fit_codebook_reservoir(
    reader,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
    n_sample: int = 65536,
    frames=None,
) -> jax.Array:
    """THE streaming codebook-fit protocol (single definition — the
    VQ-teacher seeding and the frontend.vq quantizer both call this, so
    their code spaces can never drift apart): Lloyd's sweeps on a
    cross-shard uniform frame reservoir, init from n_codes distinct
    reservoir frames.

    ``frames``: a pre-drawn reservoir (e.g. the cross-process merged one
    from ``parallel/multihost.reservoir_frames_multihost``) — must be in
    the canonical ascending-key order ``_reservoir_frames`` returns, so the
    init draw below picks the same frames on every process."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if frames is None:
        frames = _reservoir_frames(reader, n_sample)
    if frames.shape[0] < n_codes:
        raise ValueError(
            f"corpus has only {frames.shape[0]} real frames < {n_codes} codes"
        )
    flat = jnp.asarray(frames)
    idx0 = jax.random.choice(key, flat.shape[0], (n_codes,), replace=False)
    return _kmeans_fit(
        flat[idx0], flat, jnp.ones((flat.shape[0],), jnp.float32),
        n_codes=n_codes, num_iterations=num_iterations,
    )


def quantize_shards_streaming(
    reader,
    out_dir,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
    n_sample: int = 65536,
    codebook: jax.Array | None = None,
    shard_ids=None,
    write_manifest: bool = True,
) -> jax.Array:
    """Out-of-core ``quantize_frames``: fit the k-means codebook on a
    cross-shard frame reservoir (``_reservoir_frames``), then assign every
    shard's frames and write a PARALLEL DISCRETE shard directory (``src`` =
    int32 code ids, ``src_vocab`` = n_codes; lengths/targets/gold copied) —
    the corpus a discrete-HMM teacher streams over in the out-of-core
    VQ-teacher recipe.  Returns the fitted [n_codes, D] codebook.

    The only protocol difference vs the resident ``quantize_frames`` is the
    codebook fit: Lloyd's sweeps run on a >=64k-frame uniform sample instead
    of every frame (the assignment step still covers every frame exactly).

    ``shard_ids`` / ``write_manifest``: the multihost partition hooks —
    process p writes only its own shard subset into a SHARED out_dir and
    only the coordinator writes the manifest/gold (the assignment is
    embarrassingly parallel across shards; see
    ``parallel/multihost.init_vq_teacher_streaming_multihost``).
    """
    import json as _json
    import shutil
    from pathlib import Path

    import numpy as np

    if codebook is not None:
        # pre-fit codebook (e.g. the persisted VQ-frontend artifact at
        # decode time): skip the reservoir fit, assignment only
        cb = codebook
        n_codes = int(cb.shape[0])
    else:
        cb = fit_codebook_reservoir(
            reader, n_codes=n_codes, num_iterations=num_iterations, key=key,
            n_sample=n_sample,
        )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # the astype is in-jit so float16-STORAGE shards cross H2D compact and
    # upcast on device (f32 shards: a no-op)
    assign = jax.jit(lambda c, f: _kmeans_assign(c, f.astype(jnp.float32)))
    if shard_ids is None:
        shard_ids = range(reader.num_shards)
    for k in shard_ids:
        src = np.asarray(
            np.load(reader.directory / f"src_{k}.npy", mmap_mode="r")
        )
        codes = np.asarray(
            assign(cb, jnp.asarray(src.reshape(-1, src.shape[-1])))
        ).reshape(src.shape[:2]).astype(np.int32)
        np.save(out / f"src_{k}.npy", codes)
        for field in ("src_len", "trg", "trg_len"):
            shutil.copyfile(
                reader.directory / f"{field}_{k}.npy", out / f"{field}_{k}.npy"
            )
    if write_manifest:
        manifest = _json.loads((reader.directory / "manifest.json").read_text())
        manifest["src_vocab"] = int(n_codes)
        manifest["name"] = manifest.get("name", "corpus") + "-vqcodes"
        (out / "manifest.json").write_text(_json.dumps(manifest))
        if (reader.directory / "gold.json").exists():
            shutil.copyfile(reader.directory / "gold.json", out / "gold.json")
    return cb


def init_vq_teacher_streaming(
    reader,
    code_dir,
    max_jump: int = 3,
    n_components: int = 1,
    key: jax.Array | None = None,
    dtype=jnp.float32,
    *,
    n_codes: int = 64,
    teacher_iters: int = 10,
    seed_rounds: int = 3,
    use_pallas: bool = False,
    prefetch: int = 1,
    n_sample: int = 65536,
) -> GaussianHMMParams:
    """Fully OUT-OF-CORE ``init_vq_teacher``: the flagship dense-region
    recipe with no resident corpus anywhere (closes round-3 VERDICT item 2 /
    ROADMAP known-limitation 6, which seeded from shard 0 only):

      1. codebook from a cross-shard frame reservoir; every shard quantized
         to a parallel discrete shard dir (``quantize_shards_streaming``);
      2. discrete-HMM teacher trained by EXACT streamed EM over the code
         shards (``data.stream.train_streaming`` — counts are additive);
      3. base Gaussian params from streamed whole-corpus moments (identical
         protocol to the resident ``init``: same key, same jitter);
      4. ``seed_rounds`` rounds of streamed pinned-assignment GMM EM: the
         teacher's posteriors over each code shard are paired with the same
         rows' frame shard, counts summed across shards, one m_step/round;
      5. the teacher's learned transitions copied over.

    Every stage is additive-across-shards, so the result is exactly the
    resident recipe up to (a) float addition order and (b) the codebook
    being fit on a >=``n_sample`` frame sample instead of all frames.
    """
    from multimodalworddiscovery_tpu.data.stream import (
        ShardedCorpusReader,
        prefetched,
        train_streaming,
        tree_sum_bounded,
    )
    from multimodalworddiscovery_tpu.models import hmm as dhmm

    if key is None:
        key = jax.random.PRNGKey(0)
    k_init, k_vq = jax.random.split(key)

    # base params from streamed whole-corpus moments (mode="global" — same
    # as the resident init(); shard-0 shift for two-pass-grade variance)
    shard0 = reader.load_shard(0)
    shift = feature_shift(shard0)
    mom_fn = jax.jit(lambda c: init_moments(c, shift, with_diagonal=False))
    moments = tree_sum_bounded(
        mom_fn(s)
        for s in prefetched(reader.load_shard, reader.num_shards, prefetch)
    )
    base = init_from_moments(
        moments, max_jump=max_jump, n_components=n_components, key=k_init,
        mode="global", shift=shift, dtype=dtype,
    )

    quantize_shards_streaming(
        reader, code_dir, n_codes=n_codes, key=k_vq, n_sample=n_sample
    )
    code_reader = ShardedCorpusReader(code_dir)
    tp = dhmm.init(code_reader.load_shard(0), max_jump=max_jump)  # vocab-only
    tp, _ = train_streaming(
        dhmm, tp, code_reader, teacher_iters,
        count_kwargs={"use_pallas": use_pallas}, prefetch=prefetch,
    )

    zero_w = jnp.zeros((2 * max_jump + 3,), dtype)

    @jax.jit
    def seed_counts_shard(gp, tp, fshard, fcode):
        gamma = dhmm.posteriors(tp, fcode)
        r = teacher_responsibilities(gamma, fshard)
        return counts_from_responsibilities(gp, fshard, r, zero_w)

    gp = base
    for _ in range(max(int(seed_rounds), 1)):
        total = tree_sum_bounded(
            seed_counts_shard(
                gp, tp, fshard, code_reader.load_shard(k)
            )
            for k, fshard in enumerate(
                prefetched(reader.load_shard, reader.num_shards, prefetch)
            )
        )
        gp = m_step(gp, total)
    return gp.replace(log_jump=tp.log_jump, log_p0=tp.log_p0)
