"""Fused Pallas Viterbi (ops/viterbi_pallas.py) vs the XLA scan decoder
(models/hmm_core.py:viterbi_factored), interpret mode on CPU."""

import jax
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import hmm, hmm_core
from multimodalworddiscovery_tpu.ops.viterbi_pallas import (
    pick_tiles_viterbi,
    viterbi_pallas,
)


@pytest.fixture(scope="module")
def setup():
    corpus, _, _ = make_flickr8k_mini(n_utterances=24, seed=7)
    params = hmm.init(corpus)
    for _ in range(4):
        params, _ = hmm.em_step(params, corpus)
    log_init = hmm_core.build_log_init(params.log_p0, corpus)
    base, rowz, colmask = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    log_emit = hmm._log_emissions(params, corpus)
    return corpus, (log_init, base, rowz, colmask, log_emit, corpus.src_len)


def _score(path, log_init, base, rowz, colmask, log_emit, src_len):
    """Host-side path score under the factored transitions."""
    li = np.asarray(log_init)
    b = np.asarray(base)
    rz = np.asarray(rowz)
    cm = np.asarray(colmask)
    le = np.asarray(log_emit)
    sl = np.asarray(src_len)
    p = np.asarray(path)
    out = np.zeros(p.shape[0])
    for i in range(p.shape[0]):
        if sl[i] == 0:
            continue
        s = li[i, p[i, 0]] + le[i, 0, p[i, 0]]
        for t in range(1, sl[i]):
            s += (
                b[p[i, t - 1], p[i, t]]
                - rz[i, p[i, t - 1]]
                + cm[i, p[i, t]]
                + le[i, t, p[i, t]]
            )
        out[i] = s
    return out


def test_viterbi_pallas_matches_scan_decoder(setup):
    corpus, args = setup
    ref = np.asarray(hmm_core.viterbi_factored(*args))
    got = np.asarray(viterbi_pallas(*args, interpret=True))
    mask = np.asarray(corpus.src_mask())
    # paths agree up to fp-tie argmax flips; scores must match exactly-ish
    agree = (ref == got)[mask].mean()
    assert agree > 0.99, agree
    np.testing.assert_allclose(
        _score(got, *args), _score(ref, *args), rtol=1e-5, atol=1e-3
    )


def test_viterbi_pallas_tile_sizes_irrelevant(setup):
    corpus, args = setup
    a = np.asarray(viterbi_pallas(*args, block_n=128, chunk_t=16, interpret=True))
    b = np.asarray(viterbi_pallas(*args, block_n=8, chunk_t=4, interpret=True))
    c = np.asarray(viterbi_pallas(*args, block_n=16, chunk_t=1, interpret=True))
    mask = np.asarray(corpus.src_mask())
    np.testing.assert_array_equal(a[mask], b[mask])
    np.testing.assert_array_equal(a[mask], c[mask])


def test_viterbi_pallas_alignment_downstream(setup):
    """path_to_alignment over the kernel's path == the production align()."""
    corpus, args = setup
    ref = np.asarray(
        hmm_core.path_to_alignment(hmm_core.viterbi_factored(*args), corpus)
    )
    got = np.asarray(
        hmm_core.path_to_alignment(
            viterbi_pallas(*args, interpret=True), corpus
        )
    )
    assert (ref == got).mean() > 0.99


def test_pick_tiles_viterbi_budget():
    from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import _round_up

    budget = 12 << 20
    for ts, s, n in ((31, 12, 8000), (147, 64, 1024), (181, 128, 512)):
        bn, tc = pick_tiles_viterbi(ts, s, n)
        s_pad = _round_up(s, 8)
        fixed = s_pad * s_pad * 4 + 14 * s_pad * bn * 4
        assert 4 * tc * s_pad * bn * 4 + fixed <= budget
        assert bn <= max(_round_up(n, 128), 128)
