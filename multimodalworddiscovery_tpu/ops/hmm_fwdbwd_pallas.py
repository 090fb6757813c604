"""Fused Pallas HMM E-step: forward + backward + posteriors in ONE kernel.

BASELINE.json north star: the HMM forward-backward recursion (SURVEY.md §3.2
🔥, the headline benchmark) as a Pallas kernel instead of a per-step XLA scan.

Layout: the batch lives on the LANE axis (128 utterances per block), states on
sublanes — the recursion's [S, S] contraction is then pure VPU work over
[S, S, 128] tiles with no HBM round-trip for the carried alpha:

  grid = (N / BN,)   one program per utterance block
  VMEM residents: log_emit [Ts, S, BN], log_trans [S, S, BN], alphas [Ts, S, BN]

  pass 1 (forward):  alpha[t] kept in VMEM scratch, logZ per lane at the end
  pass 2 (backward): beta carried in registers; writes gamma[t] (state
                     posteriors) straight to HBM and accumulates the pooled
                     transition tensor  xi_sum[s, s'] = sum_{t,n} xi  in VMEM

Outputs: gamma [N, Ts, S] (feeds the emission-count scatter, which stays in
XLA — scatters are not a TPU kernel's job), xi_pooled [S, S] per block
(projected onto jump widths by the caller), logZ [N].

The jnp scans in models/hmm_core.py are the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def estep_vmem_bytes(ts: int, s: int, block_n: int = 128) -> int:
    """Rough VMEM footprint of one kernel block (with double buffering):
    emit in (x2) + gamma out (x2) + alphas scratch + trans (x2) + misc."""
    s_pad = _round_up(s, 8)
    big = ts * s_pad * block_n * 4
    trans = s_pad * s_pad * block_n * 4
    return 2 * big + 2 * big + big + 2 * trans


def estep_fits_vmem(ts: int, s: int, block_n: int = 128, budget: int = 14 << 20) -> bool:
    """Whether the whole-block-resident kernel fits VMEM.

    The kernel keeps emissions, alphas, and the gamma output block resident;
    at large Ts*S it exceeds the ~16 MB VMEM (observed OOM at Ts=124, S=64).
    Callers (hmm.em_step) fall back to the XLA scan path, which is equally
    fast at small S anyway (docs/PERFORMANCE.md).
    """
    return estep_vmem_bytes(ts, s, block_n) <= budget


def _kernel(
    init_ref,   # [S, BN]
    trans_ref,  # [S, S, BN]
    emit_ref,   # [Ts, S, BN]
    len_ref,    # [1, BN]
    gamma_ref,  # out [Ts, S, BN]
    xi_ref,     # out [S, S]
    logz_ref,   # out [1, BN]
    alphas,     # scratch [Ts, S, BN]
    *,
    ts: int,
):
    s, bn = init_ref.shape
    lens = len_ref[0, :]  # [BN]
    trans = trans_ref[:]  # [S, S, BN]

    def lse_over_prev(vec):
        # vec [S, BN] -> logsumexp_s(vec[s] + trans[s, s', :]) -> [S', BN]
        x = vec[:, None, :] + trans  # [S, S', BN]
        m = jnp.max(x, axis=0)  # [S', BN]
        m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
        out = jnp.log(jnp.sum(jnp.exp(x - m_safe[None, :, :]), axis=0) + 1e-38)
        return jnp.where(m > NEG_INF / 2, out + m_safe, NEG_INF)

    # ---------- forward ----------
    alpha0 = init_ref[:] + emit_ref[0]
    alphas[0] = alpha0

    def fwd_body(t, alpha):
        upd = lse_over_prev(alpha) + emit_ref[t]
        alive = (t < lens)[None, :]
        alpha_new = jnp.where(alive, upd, alpha)
        alphas[t] = alpha_new
        return alpha_new

    alpha_last = jax.lax.fori_loop(1, ts, fwd_body, alpha0)

    m = jnp.max(alpha_last, axis=0)
    m_safe = jnp.where(m > NEG_INF / 2, m, 0.0)
    logz = jnp.log(jnp.sum(jnp.exp(alpha_last - m_safe[None, :]), axis=0) + 1e-38)
    logz = jnp.where(m > NEG_INF / 2, logz + m_safe, NEG_INF)
    logz = jnp.where(lens > 0, logz, 0.0)
    logz_ref[0, :] = logz
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)

    # ---------- backward + posteriors + pooled transition counts ----------
    xi_acc0 = jnp.zeros((s, s), jnp.float32)
    beta_last = jnp.zeros((s, bn), jnp.float32)

    # gamma at the last time index (beta = 0 there for lanes with len == ts)
    def write_gamma(t, beta_t):
        lg = alphas[t] + beta_t - logz_safe[None, :]
        alive = (t < lens)[None, :]
        gamma_ref[t] = jnp.where(alive, jnp.exp(jnp.minimum(lg, 0.0)), 0.0)

    write_gamma(ts - 1, beta_last)

    def bwd_body(i, carry):
        beta, xi_acc = carry
        t = ts - 2 - i  # ts-2 .. 0
        emit_next = emit_ref[t + 1]
        eb = emit_next + beta  # [S', BN]
        # beta[t] = logsumexp_{s'}(trans[s, s', n] + eb[s', n])
        x = trans + eb[None, :, :]  # [S, S', BN]
        mm = jnp.max(x, axis=1)  # [S, BN]
        mm_safe = jnp.where(mm > NEG_INF / 2, mm, 0.0)
        upd = jnp.log(jnp.sum(jnp.exp(x - mm_safe[:, None, :]), axis=1) + 1e-38)
        upd = jnp.where(mm > NEG_INF / 2, upd + mm_safe, NEG_INF)
        ended = ((t + 1) >= lens)[None, :]
        beta_new = jnp.where(ended, jnp.zeros_like(upd), upd)

        # xi for the t -> t+1 transition (lanes where t+1 < len)
        logxi = (
            alphas[t][:, None, :] + trans + eb[None, :, :] - logz_safe[None, None, :]
        )
        alive2 = ((t + 1) < lens)[None, None, :]
        xi = jnp.where(alive2, jnp.exp(jnp.minimum(logxi, 0.0)), 0.0)
        xi_acc = xi_acc + jnp.sum(xi, axis=2)

        write_gamma(t, beta_new)
        return beta_new, xi_acc

    _, xi_acc = jax.lax.fori_loop(0, ts - 1, bwd_body, (beta_last, xi_acc0))
    xi_ref[:] = xi_acc[None]  # out block is [1, S, S]


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def hmm_estep_pallas(
    log_init: jax.Array,   # [N, S]
    log_trans: jax.Array,  # [N, S, S]
    log_emit: jax.Array,   # [N, Ts, S]
    src_len: jax.Array,    # [N]
    block_n: int = 128,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused E-step.  Returns (gamma [N, Ts, S], xi_pooled [S, S], logz [N]).

    gamma is zero outside the valid (time, state) region; xi_pooled is the
    transition posterior summed over all t and n (per-jump-width projection is
    the caller's).
    """
    n, ts, s = log_emit.shape
    s_pad = _round_up(s, 8)
    n_pad = _round_up(n, block_n)

    def pad(x, target_shape):
        out = jnp.full(target_shape, NEG_INF, jnp.float32)
        return out.at[tuple(slice(0, d) for d in x.shape)].set(x)

    init_p = pad(log_init, (n_pad, s_pad))
    trans_p = pad(log_trans, (n_pad, s_pad, s_pad))
    emit_p = pad(log_emit, (n_pad, ts, s_pad))
    len_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(src_len)

    # lane-major layouts
    init_t = jnp.moveaxis(init_p, 0, -1)  # [S, N]
    trans_t = jnp.moveaxis(trans_p, 0, -1)  # [S, S, N]
    emit_t = jnp.moveaxis(emit_p, 0, -1)  # [Ts, S, N]
    len_t = len_p[None, :]  # [1, N]

    grid = (n_pad // block_n,)
    gamma, xi, logz = pl.pallas_call(
        functools.partial(_kernel, ts=ts),
        out_shape=(
            jax.ShapeDtypeStruct((ts, s_pad, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], s_pad, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s_pad, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, s_pad, block_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, s_pad, block_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, s_pad, block_n), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((ts, s_pad, block_n), jnp.float32)],
        interpret=interpret,
    )(init_t, trans_t, emit_t, len_t)

    gamma = jnp.moveaxis(gamma, -1, 0)[:n, :, :s]  # [N, Ts, S]
    xi_pooled = jnp.sum(xi, axis=0)[:s, :s]
    return gamma, xi_pooled, logz[0, :n]
