"""Data-parallel EM via pjit sharding constraints.

The reference is single-process single-thread (SURVEY.md §2: parallelism
"absent").  TPU-native equivalent (SURVEY.md §5.8): shard the padded corpus
over a 1-D ``('data',)`` mesh; parameters stay replicated; XLA turns the
expected-count reductions inside ``em_step`` into one ``psum`` per M-step over
ICI.  No NCCL/MPI translation — just shardings + jit.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalworddiscovery_tpu.core.mesh import DATA_AXIS, pad_to_multiple
from multimodalworddiscovery_tpu.data.corpus import Corpus


def shard_corpus(corpus: Corpus, mesh: Mesh, axis_name: str = DATA_AXIS) -> Corpus:
    """Pad N to a multiple of the mesh size and shard the utterance axis."""
    n_dev = mesh.shape[axis_name]
    padded = corpus.pad_to(pad_to_multiple(corpus.n, n_dev))
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), padded)


def make_data_parallel_step(
    step_fn: Callable[[Any, Corpus], tuple[Any, dict]],
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
):
    """jit ``step_fn`` with (replicated params, sharded corpus) -> replicated.

    XLA inserts the cross-chip all-reduce for the M-step count tensors
    automatically from the output sharding constraint.
    """
    repl = NamedSharding(mesh, P())

    return jax.jit(
        step_fn,
        in_shardings=(repl, None),
        out_shardings=(repl, repl),
    )
