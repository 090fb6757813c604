"""Data-parallel EM: pjit/GSPMD sharding constraints AND an explicit
``shard_map`` step.

The reference is single-process single-thread (SURVEY.md §2: parallelism
"absent").  TPU-native equivalent (SURVEY.md §5.8): shard the padded corpus
over a 1-D ``('data',)`` mesh; parameters stay replicated; one ``psum`` of
the expected-count tensors per M-step rides the ICI.  No NCCL/MPI
translation — just shardings + collectives.

Two interchangeable mechanisms (parity pinned by tests/test_parallel.py):

- ``make_data_parallel_step``: jit with in/out shardings; GSPMD chooses the
  partitioning and inserts the all-reduce itself.
- ``make_shard_map_em_step``: per-shard expected counts written explicitly —
  each device runs the E-step (including its Pallas kernels) on its local
  corpus shard, the ``psum`` is written in the step, and the closed-form
  M-step runs replicated.  On a real multi-chip mesh this pins down the
  placement decisions GSPMD is otherwise free to make around the three
  chained pallas_calls.
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
    n_extra_args: int = 0,
):
    """jit ``step_fn`` with (replicated params, sharded corpus) -> replicated.

    XLA inserts the cross-chip all-reduce for the M-step count tensors
    automatically from the output sharding constraint.  ``n_extra_args``
    trailing scalar arguments (e.g. an annealing temperature) are left to
    XLA's default placement (replicated host scalars).
    """
    repl = NamedSharding(mesh, P())

    return jax.jit(
        step_fn,
        in_shardings=(repl, None) + (None,) * n_extra_args,
        out_shardings=(repl, repl),
    )


def make_shard_map_em_step(
    mod: Any,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    count_kwargs: dict | None = None,
    m_step_kwargs: dict | None = None,
):
    """Explicit ``shard_map`` data-parallel EM step for the closed-form EM
    aligners (model1 / hmm / hmm_gaussian: modules exposing
    ``expected_counts(params, corpus, **kw) -> (counts, loglik)`` and
    ``m_step(params, counts, **kw)``).

    Unlike ``make_data_parallel_step`` (GSPMD decides), the data movement is
    written out: every device computes the expected counts of its N/D corpus
    shard locally — pallas_calls and all — then ONE ``lax.psum`` of the count
    pytree + loglik closes the E-step, and the M-step normalization runs
    replicated on every device.  Counts are additive across shards, so this
    is exactly the single-device ``em_step`` (test_parallel.py pins all three
    paths equal).

    Returns ``step(params, sharded_corpus) -> (params, {"loglik": ...})``.
    """
    ckw = dict(count_kwargs or {})
    mkw = dict(m_step_kwargs or {})

    def shard_fn(params, shard):
        counts, ll = mod.expected_counts(params, shard, **ckw)
        return jax.lax.psum((counts, ll), axis_name)

    sharded_counts = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        # the E-step's scans initialize carries from non-varying constants
        # (e.g. backward's zero beta), which the varying-manual-axes checker
        # rejects; semantics are pinned by the parity tests instead
        check_vma=False,
    )

    @jax.jit
    def step(params, corpus: Corpus):
        counts, ll = sharded_counts(params, corpus)
        return mod.m_step(params, counts, **mkw), {"loglik": ll}

    return step
