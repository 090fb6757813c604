import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF, log_matmul
from multimodalworddiscovery_tpu.ops.log_semiring import log_matmul_pallas


@pytest.mark.parametrize("shape", [(128, 128, 128), (64, 200, 96), (300, 140, 260)])
def test_matches_jnp_oracle(shape):
    i, k, j = shape
    rng = np.random.default_rng(hash(shape) % 2**31)
    a = (5 * rng.normal(size=(i, k))).astype(np.float32)
    b = (5 * rng.normal(size=(k, j))).astype(np.float32)
    got = np.asarray(log_matmul_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    want = np.asarray(log_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_handles_neg_inf_rows():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(64, 64)).astype(np.float32)
    b = rng.normal(size=(64, 64)).astype(np.float32)
    a[3, :] = NEG_INF  # fully masked row
    b[:, 7] = NEG_INF  # fully masked col
    got = np.asarray(log_matmul_pallas(jnp.asarray(a), jnp.asarray(b), interpret=True))
    assert np.all(np.isfinite(got[got > NEG_INF / 2]))
    assert np.all(got[3, :] <= NEG_INF / 2)
    assert np.all(got[:, 7] <= NEG_INF / 2)
    want = np.asarray(log_matmul(jnp.asarray(a), jnp.asarray(b)))
    mask = want > NEG_INF / 2
    np.testing.assert_allclose(got[mask], want[mask], rtol=1e-4, atol=1e-4)


def test_multi_k_tiles_accumulate():
    rng = np.random.default_rng(1)
    a = (3 * rng.normal(size=(128, 512))).astype(np.float32)
    b = (3 * rng.normal(size=(512, 128))).astype(np.float32)
    got = np.asarray(
        log_matmul_pallas(jnp.asarray(a), jnp.asarray(b), block_k=128, interpret=True)
    )
    want = np.asarray(log_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_vmapped_batch():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(4, 96, 64)).astype(np.float32)
    b = rng.normal(size=(4, 64, 80)).astype(np.float32)
    f = jax.vmap(lambda x, y: log_matmul_pallas(x, y, interpret=True))
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    want = np.asarray(log_matmul(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_log_matmul_pallas_bf16_close():
    import numpy as np
    from multimodalworddiscovery_tpu.ops.log_semiring import log_matmul_pallas

    rng = np.random.default_rng(3)
    a = jnp.asarray((4 * rng.normal(size=(96, 160))).astype(np.float32))
    b = jnp.asarray((4 * rng.normal(size=(160, 72))).astype(np.float32))
    f32 = log_matmul_pallas(a, b, interpret=True)
    bf16 = log_matmul_pallas(a, b, dot_dtype="bfloat16", interpret=True)
    # exponentials <= 1: bf16 rounding costs ~1e-2 absolute in log space
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=5e-2)
