"""Shared HMM alignment machinery (state space, transitions, fwd-bwd, Viterbi).

Reference counterpart: the discrete/Gaussian HMM word discoverers' per-
utterance ``forward``/``backward``/``viterbi`` loops (SURVEY.md §2 C6/C7,
§3.2 🔥 "T x S^2 recursions per utterance per iteration").  Here everything is
batched over the corpus: one ``lax.scan`` over time with an [N, S] carry and
an O(N·S²) log-semiring contraction per step.

State space (Vogel/Och-style HMM word alignment with paired NULL states):
  S = 2 * Tt_max states per utterance.
  s in [0, Tt_max):          "real" state — aligned to target position s.
  s in [Tt_max, 2*Tt_max):   "null" state paired with underlying position
                             s - Tt_max (emits the NULL concept, remembers
                             where the alignment left off).

Transitions are parameterized by jump width between underlying positions
(log_jump[w + max_jump], clipped to |w| <= max_jump) plus a single null weight
log_p0 for entering/staying in the paired null state; rows are normalized over
the utterance's valid states.  Decoding a state path to an alignment gives
0 for null states and pos+1 for real states — the same convention as Model-1
and the gold JSON.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from multimodalworddiscovery_tpu.core.logsemiring import (
    NEG_INF,
    log_normalize,
    masked_logsumexp,
)
from multimodalworddiscovery_tpu.core.masking import lengths_to_mask
from multimodalworddiscovery_tpu.data.corpus import Corpus


def state_positions(tt_max: int) -> tuple[jax.Array, jax.Array]:
    """Static (pos [S], is_null [S]) for S = 2*Tt_max."""
    s = jnp.arange(2 * tt_max)
    return s % tt_max, s >= tt_max


def state_mask(corpus: Corpus) -> jax.Array:
    """[N, S] validity of each state given the utterance's #concepts."""
    pos, _ = state_positions(corpus.max_trg_len)
    return pos[None, :] < corpus.trg_len[:, None]


def state_concepts(corpus: Corpus) -> jax.Array:
    """[N, S] concept id emitted by each state (0 for null states)."""
    pos, is_null = state_positions(corpus.max_trg_len)
    real_concept = jnp.take_along_axis(
        corpus.trg, jnp.broadcast_to(pos[None, :], (corpus.n, pos.shape[0])), axis=1
    )
    return jnp.where(is_null[None, :], 0, real_concept)


def jump_width_ids(tt_max: int, max_jump: int) -> jax.Array:
    """Static [S, S] index into the jump table for real-target transitions.

    width id = clip(pos' - pos, -max_jump, max_jump) + max_jump in [0, W);
    entries into null states get id W (the p0 slot); W+1 marks 'impossible'
    (null entry with mismatched underlying position).
    """
    pos, is_null = state_positions(tt_max)
    w = jnp.clip(pos[None, :] - pos[:, None], -max_jump, max_jump) + max_jump
    W = 2 * max_jump + 1
    to_null = is_null[None, :]
    same_pos = pos[None, :] == pos[:, None]
    ids = jnp.where(to_null, jnp.where(same_pos, W, W + 1), w)
    return ids.astype(jnp.int32)


def factor_log_trans(
    log_jump: jax.Array, log_p0: jax.Array, corpus: Corpus, max_jump: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Factored transition structure: trans[n,s,s'] = base[s,s'] - rowz[n,s]
    + colmask[n,s'].

    base [S, S] is the shared (utterance-independent) jump-weight matrix,
    colmask [N, S] is 0 on the utterance's valid states / NEG_INF elsewhere,
    and rowz [N, S] is the per-row log normalizer (0 for fully-masked rows,
    matching ``log_normalize``'s safe guard).  The fused Pallas E-step
    (ops/hmm_fwdbwd_pallas.py) consumes this form directly: a [N,S,S] dense
    transition tensor is 0.5 GB at N=8k, S=128, while the factored form is
    O(S^2 + N*S) and turns the recursion inner product into an MXU matmul on
    max-rescaled exponentials.
    """
    tt_max = corpus.max_trg_len
    ids = jump_width_ids(tt_max, max_jump)  # [S, S]
    table = jnp.concatenate(
        [log_jump, log_p0[None], jnp.array([NEG_INF], log_jump.dtype)]
    )  # [W + 2]
    base = table[ids]  # [S, S]
    smask = state_mask(corpus)  # [N, S]
    colmask = jnp.where(smask, 0.0, NEG_INF).astype(base.dtype)
    rowz = masked_logsumexp(base[None, :, :] + colmask[:, None, :], axis=-1)
    rowz = jnp.where(rowz > NEG_INF / 2, rowz, 0.0)  # all-masked rows
    return base, rowz, colmask


def build_log_trans(
    log_jump: jax.Array, log_p0: jax.Array, corpus: Corpus, max_jump: int
) -> jax.Array:
    """[N, S, S] row-normalized log transition matrices.

    log_jump: [W] unnormalized jump weights; log_p0: scalar null weight.
    Dense materialization of ``factor_log_trans`` (used by the XLA scan path;
    the Pallas E-step keeps the factored form).
    """
    base, rowz, colmask = factor_log_trans(log_jump, log_p0, corpus, max_jump)
    logw = base[None, :, :] + colmask[:, None, :]
    out = jnp.maximum(logw - rowz[:, :, None], NEG_INF)
    # keep exact NEG_INF at masked entries (logw - rowz could drift below)
    return jnp.where(logw > NEG_INF / 2, out, NEG_INF)


def build_log_init(log_p0: jax.Array, corpus: Corpus) -> jax.Array:
    """[N, S] initial distribution: uniform weight on real states, p0 weight
    on null states, normalized over the utterance's valid states."""
    _, is_null = state_positions(corpus.max_trg_len)
    smask = state_mask(corpus)
    w = jnp.where(is_null[None, :], log_p0, 0.0)
    w = jnp.where(smask, w, NEG_INF)
    return log_normalize(w, axis=-1)


def forward(
    log_init: jax.Array,
    log_trans: jax.Array,
    log_emit: jax.Array,
    src_len: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Batched forward pass.

    log_init [N, S]; log_trans [N, S, S]; log_emit [N, Ts, S]; src_len [N].
    Returns (alphas [Ts, N, S], logZ [N]).  Steps past an utterance's length
    carry alpha unchanged, so logZ = logsumexp(alpha[Ts-1]).
    """
    n, ts, s = log_emit.shape
    alpha0 = log_init + log_emit[:, 0]

    def step(alpha, inputs):
        t, emit_t = inputs
        # inner product over previous state: [N, S_prev, 1] + [N, S_prev, S]
        upd = masked_logsumexp(alpha[:, :, None] + log_trans, axis=1) + emit_t
        alive = (t < src_len)[:, None]
        alpha_new = jnp.where(alive, upd, alpha)
        return alpha_new, alpha_new

    ts_idx = jnp.arange(1, ts)
    _, rest = jax.lax.scan(step, alpha0, (ts_idx, jnp.moveaxis(log_emit, 1, 0)[1:]))
    alphas = jnp.concatenate([alpha0[None], rest], axis=0)  # [Ts, N, S]
    logz = masked_logsumexp(alphas[-1], axis=-1)
    # zero-length (padding) utterances: log Z of the empty sequence is 0, and
    # their alpha0 is garbage — corpora padded for even sharding hit this.
    logz = jnp.where(src_len > 0, logz, 0.0)
    return alphas, logz


def backward(
    log_trans: jax.Array, log_emit: jax.Array, src_len: jax.Array
) -> jax.Array:
    """Batched backward pass -> betas [Ts, N, S].

    beta[t] is 0 at t == len-1 and NEG_INF-free within the valid region;
    positions t >= len hold zeros (unused, masked by callers).
    """
    n, ts, s = log_emit.shape
    beta_last = jnp.zeros((n, s), log_emit.dtype)

    def step(beta, inputs):
        t, emit_next = inputs  # t from Ts-2 down to 0; emit_next = log_emit[t+1]
        x = log_trans + (emit_next + beta)[:, None, :]
        upd = masked_logsumexp(x, axis=2)
        # if t+1 >= len: this utterance already ended; beta[t] = 0 at t==len-1
        ended = (t + 1 >= src_len)[:, None]
        beta_new = jnp.where(ended, jnp.zeros_like(upd), upd)
        return beta_new, beta_new

    ts_idx = jnp.arange(ts - 2, -1, -1)
    emits = jnp.moveaxis(log_emit, 1, 0)  # [Ts, N, S]
    _, betas_rev = jax.lax.scan(step, beta_last, (ts_idx, emits[jnp.arange(ts - 1, 0, -1)]))
    betas = jnp.concatenate([betas_rev[::-1], beta_last[None]], axis=0)
    return betas


def step_matrices(
    log_trans: jax.Array, log_emit: jax.Array, src_len: jax.Array
) -> jax.Array:
    """Per-step transition matrices M_t (t >= 1) for scan-as-matrix-product.

    M_t[s, s'] = trans[s, s'] + emit[t, s'], with the IDENTITY substituted for
    steps past an utterance's length so prefix products freeze (same masking
    semantics as ``forward``).  Returns [Ts-1, N, S, S].
    """
    n, ts, s = log_emit.shape
    t_idx = jnp.arange(1, ts)
    alive = t_idx[:, None] < src_len[None, :]  # [Ts-1, N]
    m = log_trans[None, :, :, :] + log_emit[:, 1:, None, :].transpose(1, 0, 2, 3)
    eye = jnp.where(jnp.eye(s, dtype=bool), 0.0, NEG_INF)[None, None, :, :]
    return jnp.where(alive[:, :, None, None], m, eye)


def forward_associative(
    log_init: jax.Array,
    log_trans: jax.Array,
    log_emit: jax.Array,
    src_len: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Forward pass as an associative scan over log-semiring matrix products.

    alpha_t = alpha_{t-1} (x) M_t with M_t[s, s'] = trans[s, s'] + emit[t, s']
    is associative in the (logsumexp, +) semiring, so all prefix products come
    from ``lax.associative_scan`` in O(log T) depth — the sequence-parallel
    formulation (cf. GPU-accelerated forward-backward literature) that lets
    very long utterances shard their TIME axis across a mesh (SURVEY.md §5.7)
    at O(T S^3) work instead of the sequential scan's O(T S^2).

    Returns (alphas [Ts, N, S], logZ [N]) — numerically equivalent to
    ``forward`` (same masking semantics: steps past src_len carry alpha).
    """
    n, ts, s = log_emit.shape
    m = step_matrices(log_trans, log_emit, src_len)  # [Ts-1, N, S, S]

    from multimodalworddiscovery_tpu.core.logsemiring import log_matmul

    prefixes = jax.lax.associative_scan(log_matmul, m, axis=0)  # [Ts-1, N, S, S]

    alpha0 = log_init + log_emit[:, 0]  # [N, S]
    rest = masked_logsumexp(
        alpha0[None, :, :, None] + prefixes, axis=2
    )  # [Ts-1, N, S]
    alphas = jnp.concatenate([alpha0[None], rest], axis=0)
    logz = masked_logsumexp(alphas[-1], axis=-1)
    logz = jnp.where(src_len > 0, logz, 0.0)
    return alphas, logz


def forward_blocked(
    log_init: jax.Array,
    log_trans: jax.Array,
    log_emit: jax.Array,
    src_len: jax.Array,
    block: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """Blocked log-semiring forward — the single-chip MFU-lever CANDIDATE of
    round-3 VERDICT item 3 (measured verdict: scripts/bench_assoc.py +
    docs/PERFORMANCE.md).

    Time is split into blocks of ``block`` steps.  Within each block the
    [S, S] step matrices compose into all prefix products by an associative
    scan (MXU-dense log-semiring matmuls, O(log block) depth); the
    sequential recursion then runs only across the T/block boundaries
    (vector steps), and within-block alphas are recovered with one
    vector-matrix contraction per step that PARALLELIZES over blocks.

    Work: O(T N S^3) (the scan forward is O(T N S^2)); sequential depth:
    O(T/block + log block) (vs T).  This trades an S-fold FLOP increase for
    removing the per-step latency floor — worthwhile only if the sequential
    scan is latency-bound and the MXU has >= S-fold headroom.  Numerically
    equivalent to ``forward`` (same masking; identity matrices freeze steps
    past src_len).
    """
    from multimodalworddiscovery_tpu.core.logsemiring import log_matmul

    n, ts, s = log_emit.shape
    m = step_matrices(log_trans, log_emit, src_len)  # [Ts-1, N, S, S]
    nsteps = ts - 1
    nb = -(-nsteps // block)
    pad = nb * block - nsteps
    if pad:
        eye = jnp.where(jnp.eye(s, dtype=bool), 0.0, NEG_INF)
        m = jnp.concatenate(
            [m, jnp.broadcast_to(eye, (pad, n, s, s))], axis=0
        )
    mb = m.reshape(nb, block, n, s, s)

    # all within-block prefix products, tree depth log(block)
    prefixes = jax.lax.associative_scan(log_matmul, mb, axis=1)
    totals = prefixes[:, -1]  # [nb, N, S, S] whole-block products

    alpha0 = log_init + log_emit[:, 0]  # [N, S]

    def boundary(alpha, total):
        nxt = masked_logsumexp(alpha[:, :, None] + total, axis=1)
        return nxt, alpha

    _, bounds = jax.lax.scan(boundary, alpha0, totals)  # [nb, N, S]

    # within-block recovery: alpha at block b, offset j (global t = b*block +
    # j + 1) = bound_alpha_b (x) prefix_{b,j} — batched over (nb, block)
    rest = masked_logsumexp(
        bounds[:, None, :, :, None] + prefixes, axis=3
    )  # [nb, block, N, S]
    rest = rest.reshape(nb * block, n, s)[:nsteps]
    alphas = jnp.concatenate([alpha0[None], rest], axis=0)
    logz = masked_logsumexp(alphas[-1], axis=-1)
    logz = jnp.where(src_len > 0, logz, 0.0)
    return alphas, logz


def estep(
    log_jump: jax.Array,
    log_p0: jax.Array,
    max_jump: int,
    log_emit: jax.Array,
    corpus: Corpus,
    use_pallas: bool = False,
    interpret: bool = False,
    dot_dtype: str = "float32",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Shared HMM E-step for every Vogel-transition aligner (discrete /
    Gaussian / DNN-hybrid emissions differ only in ``log_emit``).

    Returns (gamma [N, Ts, S] state posteriors, width_counts [2*max_jump+3]
    expected jump counts (… , p0 slot, impossible slot), logz [N]).

    use_pallas=True routes through the fused time-chunked Pallas kernel
    (ops/hmm_fwdbwd_pallas.py: forward, backward, posteriors and pooled
    transition counts in one pass, MXU inner products); the XLA scan path
    below is its oracle.  All outputs are additive across corpus shards or
    length buckets (exact bucketed / data-parallel EM).
    """
    tt_max = corpus.max_trg_len
    log_init = build_log_init(log_p0, corpus)

    if use_pallas:
        from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
            hmm_estep_pallas,
        )

        base, rowz, colmask = factor_log_trans(log_jump, log_p0, corpus, max_jump)
        gamma_nts, xi_pooled, logz = hmm_estep_pallas(
            log_init, base, rowz, colmask, log_emit, corpus.src_len,
            dot_dtype=dot_dtype, interpret=interpret,
        )
    else:
        n, ts, s = log_emit.shape
        log_trans = build_log_trans(log_jump, log_p0, corpus, max_jump)
        alphas, logz = forward(log_init, log_trans, log_emit, corpus.src_len)
        betas = backward(log_trans, log_emit, corpus.src_len)

        smask = state_mask(corpus)  # [N, S]
        tmask = lengths_to_mask(corpus.src_len, ts)  # [N, Ts]
        logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)

        log_gamma = alphas + betas - logz_safe[None, :, None]
        valid = tmask.T[:, :, None] & smask[None, :, :]
        gamma = jnp.where(valid, jnp.exp(log_gamma), 0.0)  # [Ts, N, S]
        gamma_nts = jnp.moveaxis(gamma, 0, 1)

        def xi_step(acc, inputs):
            t, alpha_t, beta_next, emit_next = inputs
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

    # project pooled xi onto jump widths ONCE (not one scatter per scan step)
    return gamma_nts, project_widths(xi_pooled, tt_max, max_jump), logz


def project_widths(
    xi_pooled: jax.Array, tt_max: int, max_jump: int
) -> jax.Array:
    """Pooled transition posteriors [S, S] -> expected jump-width counts
    [2*max_jump+3] (..., p0 slot, impossible slot).  Shared by estep and the
    fused Pallas pipeline (models/hmm.py:_expected_counts_fused)."""
    width_ids = jump_width_ids(tt_max, max_jump)
    return jax.ops.segment_sum(
        xi_pooled.reshape(-1), width_ids.reshape(-1),
        num_segments=2 * max_jump + 3,
    )


def posteriors_from(
    log_init: jax.Array,
    log_trans: jax.Array,
    log_emit: jax.Array,
    corpus: Corpus,
) -> jax.Array:
    """State posteriors [N, Ts, S] from assembled machinery (shared by the
    per-model ``posteriors`` wrappers; inspection/plotting/guide paths)."""
    alphas, logz = forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = backward(log_trans, log_emit, corpus.src_len)
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    gamma = jnp.exp(alphas + betas - logz_safe[None, :, None])
    valid = (
        lengths_to_mask(corpus.src_len, log_emit.shape[1]).T[:, :, None]
        & state_mask(corpus)[None, :, :]
    )
    return jnp.moveaxis(jnp.where(valid, gamma, 0.0), 0, 1)


def viterbi(
    log_init: jax.Array,
    log_trans: jax.Array,
    log_emit: jax.Array,
    src_len: jax.Array,
) -> jax.Array:
    """Batched Viterbi decode -> state path [N, Ts] (junk past src_len).

    Max-plus scan forward with backpointers, reverse scan to trace the path.
    """
    n, ts, s = log_emit.shape
    delta0 = log_init + log_emit[:, 0]

    def fwd(delta, inputs):
        t, emit_t = inputs
        x = delta[:, :, None] + log_trans  # [N, S_prev, S]
        best = jnp.max(x, axis=1) + emit_t
        bp = jnp.argmax(x, axis=1).astype(jnp.int32)  # [N, S]
        alive = (t < src_len)[:, None]
        delta_new = jnp.where(alive, best, delta)
        ident = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (n, s))
        bp = jnp.where(alive, bp, ident)
        return delta_new, bp

    ts_idx = jnp.arange(1, ts)
    delta_final, bps = jax.lax.scan(
        fwd, delta0, (ts_idx, jnp.moveaxis(log_emit, 1, 0)[1:])
    )  # bps: [Ts-1, N, S]

    last = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)  # [N]

    def back(state, bp_t):
        prev = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        return prev, state

    first_state, states_rev = jax.lax.scan(back, last, bps[::-1])
    path = jnp.concatenate([first_state[None], states_rev[::-1]], axis=0)  # [Ts, N]
    return jnp.moveaxis(path, 0, 1)


def viterbi_factored(
    log_init: jax.Array,  # [N, S]
    base: jax.Array,      # [S, S]
    rowz: jax.Array,      # [N, S]
    colmask: jax.Array,   # [N, S]
    log_emit: jax.Array,  # [N, Ts, S]
    src_len: jax.Array,   # [N]
    use_pallas: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Viterbi decode from FACTORED transitions — never materializes the
    [N, S, S] transition tensor (2.6 GB at N=40k, S=128; the per-step
    [N, S, S] broadcast lives only inside the fused scan step).  Backpointers
    are stored int8 when S < 128 (4x smaller than int32: the [Ts, N, S]
    backtrace is the dominant decode buffer at corpus scale).

    Equivalent to ``viterbi(log_init, build_log_trans(...), ...)``; that
    dense form is the test oracle.  ``use_pallas=True`` routes through the
    fused kernel (ops/viterbi_pallas.py: delta chunks streamed, backtrace
    recomputed — no backpointer tensor at all); ties between equally-optimal
    paths may resolve differently.  NOTE the HBM tradeoff: the kernel streams
    f32 delta chunks [Ts, S, N] (~4x the int8 backpointers here at large S),
    so this scan decoder — not the kernel — is the memory-light default; the
    CLI's ``auto`` mode keeps decode here and only routes the kernel on an
    explicit ``use_pallas=on``.
    """
    if use_pallas:
        from multimodalworddiscovery_tpu.ops.viterbi_pallas import (
            viterbi_pallas,
        )

        return viterbi_pallas(
            log_init, base, rowz, colmask, log_emit, src_len,
            interpret=interpret,
        )
    n, ts, s = log_emit.shape
    bp_dtype = jnp.int8 if s < 128 else jnp.int32
    delta0 = log_init + log_emit[:, 0]
    shifted = lambda d: (d - rowz)[:, :, None] + base[None, :, :]  # [N,S,S]

    def fwd(delta, inputs):
        t, emit_t = inputs
        x = shifted(delta)
        best = jnp.max(x, axis=1) + colmask + emit_t
        bp = jnp.argmax(x, axis=1).astype(bp_dtype)  # [N, S]
        alive = (t < src_len)[:, None]
        delta_new = jnp.where(alive, best, delta)
        ident = jnp.broadcast_to(jnp.arange(s, dtype=bp_dtype)[None, :], (n, s))
        bp = jnp.where(alive, bp, ident)
        return delta_new, bp

    ts_idx = jnp.arange(1, ts)
    delta_final, bps = jax.lax.scan(
        fwd, delta0, (ts_idx, jnp.moveaxis(log_emit, 1, 0)[1:])
    )  # bps: [Ts-1, N, S]

    last = jnp.argmax(delta_final, axis=-1).astype(jnp.int32)  # [N]

    def back(state, bp_t):
        prev = jnp.take_along_axis(
            bp_t.astype(jnp.int32), state[:, None], axis=1
        )[:, 0]
        return prev, state

    first_state, states_rev = jax.lax.scan(back, last, bps[::-1])
    path = jnp.concatenate([first_state[None], states_rev[::-1]], axis=0)
    return jnp.moveaxis(path, 0, 1)


def path_to_alignment(path: jax.Array, corpus: Corpus) -> jax.Array:
    """State path [N, Ts] -> alignment [N, Ts] (0 = NULL, else 1-based pos)."""
    tt_max = corpus.max_trg_len
    pos = path % tt_max
    is_null = path >= tt_max
    a = jnp.where(is_null, 0, pos + 1).astype(jnp.int32)
    return jnp.where(corpus.src_mask(), a, 0)
