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
