import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.core.logsemiring import NEG_INF
from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import hmm, hmm_core
from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import hmm_estep_pallas


@pytest.fixture(scope="module")
def setup():
    corpus, _, _ = make_flickr8k_mini(n_utterances=24, seed=3)
    params = hmm.init(corpus)
    params, _ = hmm.em_step(params, corpus)  # non-trivial params
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)
    factored = hmm_core.factor_log_trans(
        params.log_jump, params.log_p0, corpus, params.max_jump
    )
    return corpus, params, log_init, log_trans, log_emit, factored


def _oracle(corpus, log_init, log_trans, log_emit):
    alphas, logz = hmm_core.forward(log_init, log_trans, log_emit, corpus.src_len)
    betas = hmm_core.backward(log_trans, log_emit, corpus.src_len)
    logz_safe = jnp.where(logz > NEG_INF / 2, logz, 0.0)
    gamma = jnp.exp(alphas + betas - logz_safe[None, :, None])
    smask = hmm_core.state_mask(corpus)
    valid = corpus.src_mask().T[:, :, None] & smask[None, :, :]
    gamma = jnp.moveaxis(jnp.where(valid, gamma, 0.0), 0, 1)
    # pooled xi
    ts = log_emit.shape[1]
    emits = jnp.moveaxis(log_emit, 1, 0)

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
        return acc + jnp.sum(xi, axis=0), None

    s = log_emit.shape[2]
    xi_pooled, _ = jax.lax.scan(
        xi_step,
        jnp.zeros((s, s), jnp.float32),
        (jnp.arange(ts - 1), alphas[:-1], betas[1:], emits[1:]),
    )
    return gamma, xi_pooled, logz


def test_factored_trans_matches_dense(setup):
    _, _, _, log_trans, _, (base, rowz, colmask) = setup
    dense = base[None, :, :] - rowz[:, :, None] + colmask[:, None, :]
    want = np.asarray(log_trans)
    got = np.asarray(dense)
    valid = want > NEG_INF / 2
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-5, atol=1e-5)
    assert np.all(got[~valid] < NEG_INF / 2)


def test_estep_kernel_matches_scan_oracle(setup):
    corpus, params, log_init, log_trans, log_emit, (base, rowz, colmask) = setup
    want_gamma, want_xi, want_logz = _oracle(corpus, log_init, log_trans, log_emit)
    got_gamma, got_xi, got_logz = hmm_estep_pallas(
        log_init, base, rowz, colmask, log_emit, corpus.src_len, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logz), np.asarray(want_logz), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_gamma), np.asarray(want_gamma), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_xi), np.asarray(want_xi), rtol=1e-3, atol=1e-3
    )


def test_fused_expected_counts_matches_plain(setup):
    """The fully-fused pipeline (lookup -> fwd-bwd -> pair-counts kernels,
    hmm._expected_counts_fused) matches the plain XLA expected_counts."""
    corpus, params, *_ = setup
    (ec_ref, wc_ref), ll_ref = hmm.expected_counts(params, corpus)
    (ec_f, wc_f), ll_f = hmm.expected_counts(
        params, corpus, use_pallas=True, interpret=True
    )
    scale = float(jnp.max(ec_ref))
    np.testing.assert_allclose(
        np.asarray(ec_f), np.asarray(ec_ref), atol=1e-4 * max(scale, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(wc_f), np.asarray(wc_ref), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(float(ll_f), float(ll_ref), rtol=1e-6)


def test_fused_em_training_converges(setup):
    """Full EM through the fused path reaches the same model quality."""
    corpus, params, *_ = setup
    p_ref, p_fused = params, params
    for _ in range(5):
        p_ref, _ = hmm.em_step(p_ref, corpus)
        p_fused, aux = hmm.em_step(
            p_fused, corpus, use_pallas=True, interpret=True
        )
    np.testing.assert_allclose(
        np.asarray(p_fused.log_emit), np.asarray(p_ref.log_emit),
        rtol=1e-3, atol=1e-3,
    )


def test_fused_expected_counts_large_state_gate():
    """The fused pipeline covers the raised gate (32 < S <= 64, concept
    vocab up to 256): parity vs the plain path at a many-concept shape."""
    corpus, _, _ = make_flickr8k_mini(
        n_utterances=6, n_concepts=200, min_concepts=17, max_concepts=20,
        min_word_len=2, max_word_len=3, seed=21,
    )
    assert 2 * corpus.max_trg_len > 32  # actually exercises the raised gate
    params = hmm.init(corpus)
    params, _ = hmm.em_step(params, corpus)
    (ec_ref, wc_ref), ll_ref = hmm.expected_counts(params, corpus)
    (ec_f, wc_f), ll_f = hmm.expected_counts(
        params, corpus, use_pallas=True, interpret=True
    )
    scale = float(jnp.max(ec_ref))
    np.testing.assert_allclose(
        np.asarray(ec_f), np.asarray(ec_ref), atol=1e-4 * max(scale, 1.0)
    )
    np.testing.assert_allclose(
        np.asarray(wc_f), np.asarray(wc_ref), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(float(ll_f), float(ll_ref), rtol=1e-6)


def test_pick_tiles_budget_and_caps():
    """Auto tiles prefer the widest lane block that fits the VMEM budget,
    capped by the (padded) corpus size."""
    from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
        _round_up, pick_tiles,
    )

    budget = 12 << 20
    for ts, s, n in ((31, 12, 8000), (147, 64, 1024), (181, 128, 512),
                     (512, 256, 64), (16, 8, 8)):
        bn, tc = pick_tiles(ts, s, n)
        s_pad = _round_up(s, 8)
        fixed = 2 * s_pad * s_pad * 4 + 10 * s_pad * bn * 4
        assert 6 * tc * s_pad * bn * 4 + fixed <= budget, (ts, s, n, bn, tc)
        assert bn <= max(_round_up(n, 128), 128)
        assert tc <= max(_round_up(ts, 8), 1)

    # wide preference: a corpus-filling block at small S
    assert pick_tiles(31, 12, 8000)[0] == 1024
    # tiny corpora never pad past one minimal block
    assert pick_tiles(31, 12, 16)[0] == 128
    # without n, width is bounded only by VMEM
    assert pick_tiles(31, 12)[0] == 1024


def test_pick_tiles_fused_budget_and_lowering_constraints():
    """The counts-fused tile search accounts for the phone-histogram
    scratch and never returns a chunk_t below Mosaic's 8-sublane block
    minimum (the VMEM-edge lowering failure found compiled on hardware).

    The budget check below shares the search's own cost formula (it pins
    the formula against accidental edits, not against reality); the
    formula's fidelity to actual VMEM usage is validated by the compiled
    boundary runs on hardware (S=32 and S=64 gate corners, see the
    'VMEM edge' commit) — keep re-running those when the kernel's buffers
    change."""
    from multimodalworddiscovery_tpu.ops.hmm_fwdbwd_pallas import (
        _round_up, pick_tiles_fused,
    )

    budget = 12 << 20
    cases = (
        # (ts, s, n, f_pad, e_pad, n_real) — incl. the boundary shape that
        # used to pick (1024, 1): S=32 with 128-entry vocabularies
        (70, 32, 1024, 128, 128, 16),
        (31, 12, 8000, 56, 64, 6),
        (128, 32, 2048, 128, 128, 16),
        (16, 8, 64, 32, 32, 4),
    )
    for ts, s, n, f_pad, e_pad, n_real in cases:
        bn, tc = pick_tiles_fused(ts, s, n, f_pad, e_pad, n_real)
        s_pad = _round_up(s, 8)
        assert tc % 8 == 0, (tc, (ts, s, n))
        fixed = (2 * s_pad * s_pad * 4 + f_pad * e_pad * 4
                 + (10 * s_pad + (n_real + 3) * f_pad + e_pad) * bn * 4)
        assert 4 * tc * s_pad * bn * 4 + fixed <= budget, (bn, tc)
    # the boundary shape must shrink the lane block, not the chunk
    bn, tc = pick_tiles_fused(70, 32, 1024, 128, 128, 16)
    assert bn <= 512 and tc >= 8, (bn, tc)


def test_estep_kernel_tile_sizes_irrelevant(setup):
    corpus, params, log_init, log_trans, log_emit, (base, rowz, colmask) = setup
    args = (log_init, base, rowz, colmask, log_emit, corpus.src_len)
    g1, x1, z1 = hmm_estep_pallas(*args, block_n=128, chunk_t=64, interpret=True)
    g2, x2, z2 = hmm_estep_pallas(*args, block_n=8, chunk_t=4, interpret=True)
    g3, x3, z3 = hmm_estep_pallas(*args, block_n=16, chunk_t=1, interpret=True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z3), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g3), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x3), rtol=1e-4, atol=1e-4)


def test_estep_kernel_bf16_dots_close(setup):
    """bf16 MXU inputs (exponentials <= 1) stay within loose tolerance."""
    corpus, params, log_init, log_trans, log_emit, (base, rowz, colmask) = setup
    args = (log_init, base, rowz, colmask, log_emit, corpus.src_len)
    g1, x1, z1 = hmm_estep_pallas(*args, interpret=True)
    g2, x2, z2 = hmm_estep_pallas(*args, dot_dtype="bfloat16", interpret=True)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-2, atol=2e-2)


def test_em_step_with_pallas_estep_matches(setup):
    corpus, params, *_ = setup
    p_ref, s_ref = hmm.em_step(params, corpus)
    p_pal, s_pal = hmm.em_step(params, corpus, use_pallas=True, interpret=True)
    np.testing.assert_allclose(
        float(s_ref["loglik"]), float(s_pal["loglik"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p_ref.log_emit), np.asarray(p_pal.log_emit), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(p_ref.log_jump), np.asarray(p_pal.log_jump), rtol=2e-3, atol=2e-3
    )


def test_estep_kernel_remat_matches_streaming(setup):
    """Rematerialized backward (boundary checkpoints + in-chunk alpha
    recompute) must match the streaming variant and the scan oracle."""
    corpus, params, log_init, log_trans, log_emit, (base, rowz, colmask) = setup
    args = (log_init, base, rowz, colmask, log_emit, corpus.src_len)
    g_s, x_s, z_s = hmm_estep_pallas(*args, remat=False, interpret=True)
    g_r, x_r, z_r = hmm_estep_pallas(*args, remat=True, interpret=True)
    np.testing.assert_allclose(np.asarray(z_r), np.asarray(z_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_r), np.asarray(g_s), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(x_r), np.asarray(x_s), rtol=1e-4, atol=1e-4
    )
    # chunking-boundary coverage: chunk_t that does NOT divide Ts
    g_r2, x_r2, z_r2 = hmm_estep_pallas(
        *args, remat=True, block_n=16, chunk_t=5, interpret=True
    )
    np.testing.assert_allclose(np.asarray(z_r2), np.asarray(z_s), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_r2), np.asarray(g_s), rtol=1e-4, atol=1e-5
    )
