import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.core.masking import (
    bucket_by_length,
    lengths_to_mask,
    pad_and_stack,
    pair_mask,
)


def test_lengths_to_mask():
    m = np.asarray(lengths_to_mask(jnp.asarray([0, 2, 4]), 4))
    np.testing.assert_array_equal(
        m, [[0, 0, 0, 0], [1, 1, 0, 0], [1, 1, 1, 1]]
    )


def test_pair_mask():
    sm = jnp.asarray([[True, False]])
    tm = jnp.asarray([[True, True, False]])
    pm = np.asarray(pair_mask(sm, tm))
    assert pm.shape == (1, 2, 3)
    np.testing.assert_array_equal(pm[0, 0], [True, True, False])
    assert not pm[0, 1].any()


def test_pad_and_stack_truncates_and_pads():
    out, lens = pad_and_stack(
        [np.array([1, 2, 3]), np.array([4])], pad_value=-1, max_len=2
    )
    np.testing.assert_array_equal(out, [[1, 2], [4, -1]])
    np.testing.assert_array_equal(lens, [2, 1])


def test_bucket_by_length():
    b = bucket_by_length(np.array([3, 10, 11, 25]), [10, 20])
    np.testing.assert_array_equal(b, [0, 0, 1, 2])
