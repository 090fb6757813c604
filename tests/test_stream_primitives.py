"""The two building blocks every streaming path shares (data/stream.py):
``prefetched`` (I/O-overlap generator) and ``tree_sum_bounded``
(bounded-fan-in pytree reduction)."""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.data.stream import (
    _FOLD_CHUNK,
    prefetched,
    tree_sum_bounded,
)


@pytest.mark.parametrize("total", [1, 2, 7])
@pytest.mark.parametrize("prefetch", [1, 2, 5])
def test_prefetched_order_and_coverage(total, prefetch):
    calls = []

    def load(k):
        calls.append(k)
        return k * 10

    out = list(prefetched(load, total, prefetch))
    assert out == [k * 10 for k in range(total)]
    assert sorted(calls) == list(range(total))  # each loaded exactly once


def test_prefetched_runs_ahead():
    """With prefetch=2, load(k+1) starts on the reader thread while item k
    is being consumed (it is submitted before load(k) is awaited)."""
    import time

    started = []

    def load(k):
        started.append(k)
        return k

    gen = prefetched(load, 4, prefetch=2)
    first = next(gen)
    assert first == 0
    deadline = time.monotonic() + 5.0
    while 1 not in started and time.monotonic() < deadline:
        time.sleep(0.005)  # single worker thread: give it a beat to start
    assert 1 in started
    assert list(gen) == [1, 2, 3]


def test_prefetched_validates():
    with pytest.raises(ValueError, match="prefetch"):
        list(prefetched(lambda k: k, 3, 0))


@pytest.mark.parametrize("n_items", [1, 2, _FOLD_CHUNK, _FOLD_CHUNK + 1,
                                     3 * _FOLD_CHUNK + 5])
def test_tree_sum_bounded_matches_direct_sum(n_items):
    rng = np.random.default_rng(n_items)
    items = [
        {"a": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
         "b": (jnp.asarray(rng.normal(size=(2,)).astype(np.float32)),
               jnp.float32(rng.normal()))}
        for _ in range(n_items)
    ]
    got = tree_sum_bounded(iter(items))
    want = jax.tree.map(lambda *xs: sum(xs[1:], xs[0]), *items)
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5)
