import jax
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import hmm, model1
from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager


def test_save_restore_roundtrip(tmp_path):
    corpus, _, _ = make_flickr8k_mini(n_utterances=10, seed=0)
    params = model1.init(corpus)
    params, _ = model1.em_step(params, corpus)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(3, params)
    template = model1.init(corpus)
    restored, step = mgr.restore(template)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored.log_t), np.asarray(params.log_t))
    mgr.close()


def test_latest_step_and_multiple_saves(tmp_path):
    corpus, _, _ = make_flickr8k_mini(n_utterances=8, seed=1)
    params = hmm.init(corpus)
    mgr = CheckpointManager(tmp_path / "ckpt", max_to_keep=2)
    assert mgr.latest_step() is None
    for it in (0, 1, 2):
        params, _ = hmm.em_step(params, corpus)
        mgr.save(it, params)
    assert mgr.latest_step() == 2
    restored, step = mgr.restore(hmm.init(corpus))
    assert step == 2
    np.testing.assert_allclose(
        np.asarray(restored.log_emit), np.asarray(params.log_emit), rtol=1e-6
    )
    mgr.close()


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        mgr.restore({"x": np.zeros(2)})
    mgr.close()


def test_exact_em_resume_equivalence(tmp_path):
    """Checkpoint mid-EM, restore, continue -> identical to uninterrupted run
    (SURVEY.md §5.4 'exact-resume of EM')."""
    corpus, _, _ = make_flickr8k_mini(n_utterances=20, seed=2)
    p = model1.init(corpus)
    for _ in range(6):
        p, _ = model1.em_step(p, corpus)
    direct = np.asarray(p.log_t)

    p2 = model1.init(corpus)
    mgr = CheckpointManager(tmp_path / "ckpt")
    for it in range(3):
        p2, _ = model1.em_step(p2, corpus)
    mgr.save(2, p2)
    restored, _ = mgr.restore(model1.init(corpus))
    for _ in range(3):
        restored, _ = model1.em_step(restored, corpus)
    np.testing.assert_array_equal(np.asarray(restored.log_t), direct)
    mgr.close()
