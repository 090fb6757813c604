import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as sp_logsumexp

from multimodalworddiscovery_tpu.core.logsemiring import (
    NEG_INF,
    log_matmul,
    log_normalize,
    masked_log,
    masked_logsumexp,
    max_matmul,
)


def test_masked_logsumexp_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7)).astype(np.float32)
    got = masked_logsumexp(jnp.asarray(x), axis=-1)
    want = sp_logsumexp(x, axis=-1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4)


def test_masked_logsumexp_respects_mask():
    x = jnp.asarray([[0.0, 100.0, 1.0]])
    mask = jnp.asarray([[True, False, True]])
    got = masked_logsumexp(x, mask=mask, axis=-1)
    want = np.logaddexp(0.0, 1.0)
    np.testing.assert_allclose(np.asarray(got), [want], rtol=1e-5)


def test_masked_logsumexp_all_masked_is_neg_inf_not_nan():
    x = jnp.full((2, 3), NEG_INF)
    got = np.asarray(masked_logsumexp(x, axis=-1))
    assert np.all(np.isfinite(got))
    assert np.all(got <= NEG_INF / 2)


def test_log_normalize_sums_to_one():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
    mask = jnp.asarray(rng.random((3, 5)) > 0.3)
    out = log_normalize(x, mask=mask, axis=-1)
    sums = np.asarray(jnp.sum(jnp.where(mask, jnp.exp(out), 0.0), axis=-1))
    rows_with_any = np.asarray(mask).any(axis=-1)
    np.testing.assert_allclose(sums[rows_with_any], 1.0, rtol=1e-4)


def test_masked_log_zero_is_neg_inf():
    p = jnp.asarray([0.0, 0.5, 1.0])
    out = np.asarray(masked_log(p))
    assert out[0] <= NEG_INF / 2
    np.testing.assert_allclose(out[1:], np.log([0.5, 1.0]), rtol=1e-6)


def test_log_matmul_matches_dense():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(2, 4, 5)).astype(np.float32)
    b = rng.normal(size=(2, 5, 3)).astype(np.float32)
    got = np.asarray(log_matmul(jnp.asarray(a), jnp.asarray(b)))
    want = np.log(np.einsum("bik,bkj->bij", np.exp(a), np.exp(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_max_matmul_matches_dense():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(4, 5)).astype(np.float32)
    b = rng.normal(size=(5, 3)).astype(np.float32)
    vals, arg = max_matmul(jnp.asarray(a), jnp.asarray(b))
    x = a[:, :, None] + b[None, :, :]
    np.testing.assert_allclose(np.asarray(vals), x.max(axis=1), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(arg), x.argmax(axis=1))
