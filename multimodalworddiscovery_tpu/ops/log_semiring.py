"""Pallas log-semiring matmul: C[i,j] = logsumexp_k (A[i,k] + B[k,j]).

BASELINE.json north star: "batched lax.scan / Pallas log-semiring kernels"
for the HMM forward-backward inner product (SURVEY.md §3.2 🔥).

The MXU has no logsumexp reduction, so the kernel streams K tiles
flash-attention-style: within a tile, factor out per-row max m_a[i] and
per-column max m_b[j]; then

  exp(A - m_a) @ exp(B - m_b)            <- a REAL matmul (MXU)
  tile max  M_t[i,j] = m_a[i] + m_b[j]
  running (m, acc):  m' = max(m, M_t)
                     acc' = acc * exp(m - m') + S_t * exp(M_t - m')
  final C = m + log(acc)

All exponentials are <= 1 so the accumulator stays in [0, K]; no overflow.
``core.logsemiring.log_matmul`` is the jnp oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF


def _kernel(a_ref, b_ref, out_ref, m_scratch, acc_scratch, *, bf16: bool = False):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    a = a_ref[:]  # [bi, bk]
    b = b_ref[:]  # [bk, bj]
    m_a = jnp.max(a, axis=1, keepdims=True)  # [bi, 1]
    m_b = jnp.max(b, axis=0, keepdims=True)  # [1, bj]
    # guard fully-masked (NEG_INF) tiles: exp(NEG_INF - NEG_INF) would be 1
    m_a_safe = jnp.where(m_a > NEG_INF / 2, m_a, 0.0)
    m_b_safe = jnp.where(m_b > NEG_INF / 2, m_b, 0.0)
    p = jnp.exp(a - m_a_safe)
    q = jnp.exp(b - m_b_safe)
    if bf16:
        # bf16 MXU inputs (exponentials are <= 1 by construction), f32
        # accumulate: ~1e-2 absolute log-space error for a large MFU win —
        # see docs/PERFORMANCE.md for the measured tradeoff.  Default stays
        # HIGHEST per the repo rule (matmuls feeding log pipelines).
        p, q = p.astype(jnp.bfloat16), q.astype(jnp.bfloat16)
        s_t = jnp.dot(p, q, preferred_element_type=jnp.float32)
    else:
        s_t = jnp.dot(
            p, q, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [bi, bj]
    m_t = m_a_safe + m_b_safe
    m_t = jnp.where((m_a > NEG_INF / 2) & (m_b > NEG_INF / 2), m_t, NEG_INF)

    m_old = m_scratch[:]
    m_new = jnp.maximum(m_old, m_t)
    m_new_safe = jnp.where(m_new > NEG_INF / 2, m_new, 0.0)
    acc_scratch[:] = acc_scratch[:] * jnp.exp(
        jnp.where(m_old > NEG_INF / 2, m_old, NEG_INF) - m_new_safe
    ) + s_t * jnp.exp(jnp.where(m_t > NEG_INF / 2, m_t, NEG_INF) - m_new_safe)
    m_scratch[:] = m_new

    @pl.when(k == pl.num_programs(2) - 1)
    def _finish():
        acc = acc_scratch[:]
        out_ref[:] = jnp.where(
            (m_scratch[:] > NEG_INF / 2) & (acc > 0),
            m_scratch[:] + jnp.log(jnp.maximum(acc, 1e-38)),
            NEG_INF,
        )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("block_i", "block_j", "block_k", "dot_dtype", "interpret"),
)
def log_matmul_pallas(
    a: jax.Array,
    b: jax.Array,
    block_i: int = 128,
    block_j: int = 128,
    block_k: int = 128,
    dot_dtype: str = "float32",
    interpret: bool = False,
) -> jax.Array:
    """[I, K] x [K, J] -> [I, J] in the log semiring (tiled, MXU).

    Inputs are padded with NEG_INF (identity of logsumexp) to tile multiples.
    For batched operands use jax.vmap — the kernel is rank-2.
    dot_dtype='bfloat16' trades ~1e-2 absolute log-space error for MFU.
    """
    i, k = a.shape
    k2, j = b.shape
    assert k == k2, (a.shape, b.shape)
    ip, jp, kp = _round_up(i, block_i), _round_up(j, block_j), _round_up(k, block_k)
    a_p = jnp.full((ip, kp), NEG_INF, jnp.float32).at[:i, :k].set(a)
    b_p = jnp.full((kp, jp), NEG_INF, jnp.float32).at[:k, :j].set(b)

    grid = (ip // block_i, jp // block_j, kp // block_k)
    out = pl.pallas_call(
        functools.partial(_kernel, bf16=dot_dtype == "bfloat16"),
        out_shape=jax.ShapeDtypeStruct((ip, jp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_i, block_k), lambda i_, j_, k_: (i_, k_), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_k, block_j), lambda i_, j_, k_: (k_, j_), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_i, block_j), lambda i_, j_, k_: (i_, j_), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_i, block_j), jnp.float32),
            pltpu.VMEM((block_i, block_j), jnp.float32),
        ],
        interpret=interpret,
    )(a_p, b_p)
    return out[:i, :j]
