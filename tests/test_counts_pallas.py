"""Fused one-hot contraction kernels (ops/counts_pallas.py) vs the XLA
formulations in core/counts.py, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.core.counts import pair_counts, table_lookup
from multimodalworddiscovery_tpu.ops.counts_pallas import (
    pad_time_major,
    pair_counts_pallas,
    table_lookup_pallas,
)
from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import _round_up


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, t, k, f, e = 37, 19, 11, 23, 17
    src = rng.integers(0, f, size=(n, t)).astype(np.int32)
    concepts = rng.integers(0, e, size=(n, k)).astype(np.int32)
    table = rng.normal(size=(f, e)).astype(np.float32)
    gamma = rng.uniform(size=(n, t, k)).astype(np.float32)
    # zero out ragged padding the way the E-step kernels do
    lens = rng.integers(3, t + 1, size=(n,))
    for i in range(n):
        gamma[i, lens[i]:] = 0.0
    return src, concepts, table, gamma, lens


def _padded_inputs(src, concepts, gamma, block_n=128, block_t=8):
    n, t = src.shape
    k = concepts.shape[1]
    tp = _round_up(t, block_t)
    np_ = _round_up(n, block_n)
    k_pad = _round_up(k, 8)
    src_t = pad_time_major(jnp.asarray(src), tp, np_)
    conc_t = pad_time_major(jnp.asarray(concepts), k_pad, np_)
    gamma_t = jnp.zeros((tp, k_pad, np_), jnp.float32)
    gamma_t = gamma_t.at[:t, :k, :n].set(jnp.moveaxis(jnp.asarray(gamma), 0, -1))
    return src_t, conc_t, gamma_t, tp, np_, k_pad


def test_table_lookup_matches_xla(setup):
    src, concepts, table, gamma, _ = setup
    n, t = src.shape
    k = concepts.shape[1]
    ref = np.asarray(table_lookup(jnp.asarray(table), jnp.asarray(src),
                                  jnp.asarray(concepts)))
    src_t, conc_t, _, tp, np_, k_pad = _padded_inputs(src, concepts, gamma)
    emit = table_lookup_pallas(
        jnp.asarray(table), src_t, conc_t, k_real=k,
        block_n=128, block_t=8, interpret=True,
    )
    assert emit.shape == (tp, k_pad, np_)
    got = np.moveaxis(np.asarray(emit)[:t, :k, :n], -1, 0)  # [N, T, K]
    np.testing.assert_array_equal(got, ref)  # one-hot selects are exact
    # padded state rows carry NEG_INF (E-step padded-state convention)
    assert np.all(np.asarray(emit)[:, k:, :] < -1e29)


def test_pair_counts_matches_xla(setup):
    src, concepts, table, gamma, _ = setup
    f, e = table.shape
    ref = np.asarray(pair_counts(jnp.asarray(gamma), jnp.asarray(src),
                                 jnp.asarray(concepts), f, e))
    src_t, conc_t, gamma_t, *_ = _padded_inputs(src, concepts, gamma)
    got = np.asarray(pair_counts_pallas(
        gamma_t, src_t, conc_t, n_rows=f, n_cols=e,
        block_n=128, block_t=8, interpret=True,
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-4)


def test_pair_counts_tile_sizes_irrelevant(setup):
    src, concepts, table, gamma, _ = setup
    f, e = table.shape
    outs = []
    # two configs varying BOTH tile dims (interpret-mode runs are the cost;
    # equality across a joint change still proves tile-size independence)
    for bn, bt in ((128, 8), (256, 32)):
        src_t, conc_t, gamma_t, *_ = _padded_inputs(
            src, concepts, gamma, block_n=bn, block_t=bt)
        outs.append(np.asarray(pair_counts_pallas(
            gamma_t, src_t, conc_t, n_rows=f, n_cols=e,
            block_n=bn, block_t=bt, interpret=True,
        )))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_null_rows_fast_path_matches_generic(setup):
    """The static NULL-state fast path (concept id 0 on every lane, plain
    add / rows[0] copy) matches the generic masked-select path bit-for-bit
    for the lookup and to fp tolerance for the counts."""
    src, concepts, table, gamma, _ = setup
    f, e = table.shape
    n, k = concepts.shape
    # make rows 1, 3, 5 all-zero concepts, mirroring state_concepts' NULLs
    concepts = concepts.copy()
    concepts[:, 1::2][:, :3] = 0
    null_rows_short = tuple(
        bool(np.all(concepts[:, j] == 0)) for j in range(k))
    src_t, conc_t, gamma_t, tp, np_, k_pad = _padded_inputs(
        src, concepts, gamma)
    null_rows = null_rows_short + (True,) * (k_pad - k)  # pads ride it too

    e_gen = np.asarray(table_lookup_pallas(
        jnp.asarray(table), src_t, conc_t, k_real=k,
        block_n=128, block_t=8, interpret=True))
    e_null = np.asarray(table_lookup_pallas(
        jnp.asarray(table), src_t, conc_t, k_real=k,
        block_n=128, block_t=8, null_rows=null_rows, interpret=True))
    np.testing.assert_array_equal(e_gen, e_null)

    c_gen = np.asarray(pair_counts_pallas(
        gamma_t, src_t, conc_t, n_rows=f, n_cols=e,
        block_n=128, block_t=8, interpret=True))
    c_null = np.asarray(pair_counts_pallas(
        gamma_t, src_t, conc_t, n_rows=f, n_cols=e,
        block_n=128, block_t=8, null_rows=null_rows, interpret=True))
    np.testing.assert_allclose(c_null, c_gen, rtol=1e-6, atol=1e-5)


def test_lookup_total_mass_ignores_padding(setup):
    """Padded lanes/times of pair_counts contribute exactly nothing: total
    count mass equals the sum of gamma over real entries."""
    src, concepts, table, gamma, _ = setup
    f, e = table.shape
    src_t, conc_t, gamma_t, *_ = _padded_inputs(src, concepts, gamma)
    got = np.asarray(pair_counts_pallas(
        gamma_t, src_t, conc_t, n_rows=f, n_cols=e,
        block_n=128, block_t=8, interpret=True,
    ))
    np.testing.assert_allclose(got.sum(), gamma.sum(), rtol=1e-6)
