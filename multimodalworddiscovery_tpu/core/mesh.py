"""Device mesh + sharding setup.

The reference has no distributed backend at all (SURVEY.md §2: single CPU
process). The TPU-native scaling axis is corpus/data parallelism: shard the
padded corpus over a 1-D ``('data',)`` mesh, keep parameters replicated, and
let a single ``psum`` of expected counts per EM step ride the ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return Mesh(np.array(devs[:n_devices]), (axis_name,))


def corpus_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard leading (utterance) axis over the data mesh axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (corpus padding for even shards)."""
    return ((n + m - 1) // m) * m
