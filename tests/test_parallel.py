"""Data-parallel EM over the 8-virtual-device CPU mesh (SURVEY.md §4/§5.8)."""

import jax
import numpy as np

from multimodalworddiscovery_tpu.core.mesh import make_mesh
from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import hmm, model1
from multimodalworddiscovery_tpu.parallel import make_data_parallel_step, shard_corpus


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_sharded_model1_em_matches_single_device():
    corpus, _, _ = make_flickr8k_mini(n_utterances=36, seed=1)  # 36 -> pad to 40
    params = model1.init(corpus)
    p_single, s_single = jax.jit(model1.em_step)(params, corpus)

    mesh = make_mesh()
    sharded = shard_corpus(corpus, mesh)
    assert sharded.n == 40
    step = make_data_parallel_step(model1.em_step, mesh)
    p_shard, s_shard = step(model1.init(sharded), sharded)

    np.testing.assert_allclose(
        float(s_single["loglik"]), float(s_shard["loglik"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_single.log_t), np.asarray(p_shard.log_t), rtol=1e-4, atol=1e-4
    )


def test_sharded_hmm_em_matches_single_device():
    # 21 utterances -> padded to 24: exercises zero-length padding utterances
    # inside the HMM (logZ of an empty sequence must be 0)
    corpus, _, _ = make_flickr8k_mini(n_utterances=21, seed=2)
    params = hmm.init(corpus)
    p_single, s_single = jax.jit(hmm.em_step)(params, corpus)

    mesh = make_mesh()
    sharded = shard_corpus(corpus, mesh)
    step = make_data_parallel_step(hmm.em_step, mesh)
    p_shard, s_shard = step(hmm.init(sharded), sharded)

    np.testing.assert_allclose(
        float(s_single["loglik"]), float(s_shard["loglik"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_single.log_emit), np.asarray(p_shard.log_emit), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(p_single.log_jump), np.asarray(p_shard.log_jump), rtol=1e-3, atol=1e-3
    )


def test_sharded_outputs_are_replicated():
    corpus, _, _ = make_flickr8k_mini(n_utterances=16, seed=3)
    mesh = make_mesh()
    sharded = shard_corpus(corpus, mesh)
    step = make_data_parallel_step(model1.em_step, mesh)
    p, _ = step(model1.init(sharded), sharded)
    # replicated across all 8 devices
    assert len(p.log_t.sharding.device_set) == 8
    assert p.log_t.sharding.is_fully_replicated


def test_time_sharded_forward_matches_sequential():
    import jax.numpy as jnp
    from multimodalworddiscovery_tpu.models import hmm, hmm_core
    from multimodalworddiscovery_tpu.parallel.sequence import forward_time_sharded
    from jax.sharding import Mesh

    corpus, _, _ = make_flickr8k_mini(n_utterances=10, seed=4)
    params = hmm.init(corpus)
    log_init, log_trans, log_emit = hmm._machinery(params, corpus)

    # pad time axis to a multiple of 8 (identity steps past src_len)
    ts = log_emit.shape[1]
    ts_pad = ((ts + 7) // 8) * 8
    log_emit_p = jnp.pad(log_emit, ((0, 0), (0, ts_pad - ts), (0, 0)))

    a_seq, z_seq = hmm_core.forward(log_init, log_trans, log_emit_p, corpus.src_len)

    mesh = Mesh(np.array(jax.devices()), ("seq",))
    a_par, z_par = forward_time_sharded(
        log_init, log_trans, log_emit_p, corpus.src_len, mesh
    )
    np.testing.assert_allclose(np.asarray(z_seq), np.asarray(z_par), rtol=1e-4)
    sl = np.asarray(corpus.src_len)
    smask = np.asarray(hmm_core.state_mask(corpus))
    a_seq, a_par = np.asarray(a_seq), np.asarray(a_par)
    for i in range(corpus.n):
        for t in range(sl[i]):
            np.testing.assert_allclose(
                a_seq[t, i][smask[i]], a_par[t, i][smask[i]],
                rtol=2e-3, atol=2e-3, err_msg=f"utt {i} t {t}",
            )


def test_data_parallel_fused_pallas_matches_plain():
    """The fully-fused Pallas EM pipeline composes with the data-parallel
    sharded step (GSPMD partitions around the pallas_calls; semantics must
    match the plain path exactly)."""
    import functools

    from multimodalworddiscovery_tpu.core.mesh import make_mesh
    from multimodalworddiscovery_tpu.parallel import (
        make_data_parallel_step,
        shard_corpus,
    )

    corpus, _, _ = make_flickr8k_mini(n_utterances=32, seed=5)
    mesh = make_mesh(8)
    sharded = shard_corpus(corpus, mesh)
    params = hmm.init(sharded)
    p1, s1 = make_data_parallel_step(hmm.em_step, mesh)(params, sharded)
    p2, s2 = make_data_parallel_step(
        functools.partial(hmm.em_step, use_pallas=True, interpret=True), mesh
    )(params, sharded)
    np.testing.assert_allclose(
        float(s1["loglik"]), float(s2["loglik"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1.log_emit), np.asarray(p2.log_emit), atol=1e-4)


def test_shard_map_em_step_matches_single_and_pjit():
    """VERDICT round-2 item 3: the explicit shard_map EM step (per-shard
    expected counts, psum written in the step) must equal BOTH the
    single-device em_step and the pjit/GSPMD-sharded step — for model1 and
    for the HMM including its fused Pallas path (interpret mode)."""
    import functools

    from multimodalworddiscovery_tpu.parallel import make_shard_map_em_step

    corpus, _, _ = make_flickr8k_mini(n_utterances=36, seed=6)
    mesh = make_mesh()
    sharded = shard_corpus(corpus, mesh)

    for mod, get_main in (
        (model1, lambda p: p.log_t),
        (hmm, lambda p: p.log_emit),
    ):
        params = mod.init(sharded)
        p_single, s_single = jax.jit(mod.em_step)(params, sharded)
        p_pjit, s_pjit = make_data_parallel_step(mod.em_step, mesh)(
            params, sharded
        )
        p_sm, s_sm = make_shard_map_em_step(mod, mesh)(params, sharded)
        for s_other, p_other in ((s_pjit, p_pjit), (s_sm, p_sm)):
            np.testing.assert_allclose(
                float(s_single["loglik"]), float(s_other["loglik"]), rtol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(get_main(p_single)), np.asarray(get_main(p_other)),
                rtol=1e-4, atol=1e-4,
            )

    # fused Pallas pipeline INSIDE the shard (per-device pallas_calls)
    params = hmm.init(sharded)
    p_ref, s_ref = jax.jit(hmm.em_step)(params, sharded)
    step_p = make_shard_map_em_step(
        hmm, mesh, count_kwargs=dict(use_pallas=True, interpret=True)
    )
    p_sm, s_sm = step_p(params, sharded)
    np.testing.assert_allclose(
        float(s_ref["loglik"]), float(s_sm["loglik"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_ref.log_emit), np.asarray(p_sm.log_emit),
        rtol=1e-4, atol=1e-4,
    )


def test_time_sharded_estep_matches_sequential():
    """VERDICT round-2 item 4: the FULL time-sharded E-step (forward +
    backward + gamma/xi over a 'seq' mesh) matches hmm_core.estep with the
    time axis sharded 8 ways."""
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from multimodalworddiscovery_tpu.models import hmm_core
    from multimodalworddiscovery_tpu.parallel.sequence import (
        estep_time_sharded,
    )

    corpus, _, _ = make_flickr8k_mini(n_utterances=10, seed=7)
    params = hmm.init(corpus)
    ts = corpus.max_src_len
    ts_pad = ((ts + 7) // 8) * 8
    corpus_p = corpus.replace(
        src=jnp.pad(corpus.src, ((0, 0), (0, ts_pad - ts)))
    )
    log_init, log_trans, log_emit = hmm._machinery(params, corpus_p)

    gamma_ref, width_ref, logz_ref = hmm_core.estep(
        params.log_jump, params.log_p0, params.max_jump, log_emit, corpus_p
    )

    mesh = Mesh(np.array(jax.devices()), ("seq",))
    gamma, xi, logz = estep_time_sharded(
        log_init, log_trans, log_emit, corpus_p.src_len,
        hmm_core.state_mask(corpus_p), mesh,
    )
    width = hmm_core.project_widths(xi, corpus_p.max_trg_len, params.max_jump)

    np.testing.assert_allclose(
        np.asarray(logz_ref), np.asarray(logz), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gamma_ref), np.asarray(gamma), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(width_ref), np.asarray(width), rtol=2e-3, atol=2e-3
    )


def test_shard_map_em_segmental_kmeans():
    """The ES-KMeans expected_counts/m_step split satisfies the same
    shard_map data-parallel protocol as the HMM family."""
    import jax
    import numpy as np

    from multimodalworddiscovery_tpu.core.mesh import make_mesh
    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.models import segmental_kmeans as skm
    from multimodalworddiscovery_tpu.parallel import (
        make_shard_map_em_step,
        shard_corpus,
    )

    corpus, gold, _ = make_flickr8k_mini(n_utterances=24, n_concepts=10, seed=4)
    fc, _, _ = phones_to_frames(corpus, gold, feat_dim=8, noise=0.05, seed=0)
    mesh = make_mesh()
    sharded = shard_corpus(fc, mesh)
    p0 = skm.init(fc, n_clusters=8, key=jax.random.PRNGKey(0))

    step = make_shard_map_em_step(skm, mesh)
    p_sm, st = step(p0, sharded)
    p_ref, st_ref = jax.jit(skm.em_step)(p0, fc)
    np.testing.assert_allclose(
        float(st["loglik"]), float(st_ref["loglik"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(p_sm.centroids), np.asarray(p_ref.centroids), atol=1e-4
    )
