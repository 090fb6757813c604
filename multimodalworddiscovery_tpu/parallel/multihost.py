"""Multi-host (pod-scale) data parallelism.

The reference is a single CPU process (SURVEY.md §2: parallelism "absent");
its largest runs fit one machine.  The TPU-native scaling story past one host
is standard JAX multi-controller SPMD: every process calls
``jax.distributed.initialize``, sees the same global mesh over all chips, and
runs the SAME jitted EM/training step on global arrays.  Within a slice the
expected-count ``psum`` rides ICI; across slices it crosses DCN — XLA picks
the collective, no NCCL/MPI code here.

Design:

- Each process loads ONLY its own corpus shard from disk (``process_slice``
  gives the utterance range); ``global_corpus_from_local`` assembles the
  process-local arrays into global jax.Arrays sharded over the mesh's
  ``('data',)`` axis without any cross-host data movement.
- ``make_shard_map_em_step`` / ``make_data_parallel_step``
  (data_parallel.py) work unchanged on the global mesh: parameters are
  replicated (every process computes the identical M-step), the corpus is
  sharded, ONE psum of count pytrees per iteration is the entire comm
  pattern.
- Checkpoint/metrics writes are gated on ``is_coordinator()``.

Tested for real in tests/test_multihost.py: two OS processes x 4 virtual CPU
devices each (gloo collectives over localhost, the CPU stand-in for ICI/DCN)
run distributed EM and must match the single-process result to float
tolerance.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodalworddiscovery_tpu.core.mesh import DATA_AXIS, pad_to_multiple
from multimodalworddiscovery_tpu.data.corpus import Corpus


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-process runtime.

    On Cloud TPU pods all three arguments are discovered from the metadata
    server and may be omitted.  Elsewhere they come from the arguments or the
    standard env vars (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``), matching ``jax.distributed``'s own conventions.
    Safe to call once per process, before any other JAX call.  Idempotent:
    a second call (e.g. cmd_train re-entering itself under the profiler
    trace) is a no-op.
    """
    if jax.distributed.is_initialized():
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/metrics."""
    return jax.process_index() == 0


def global_mesh(axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over ALL devices of ALL processes.

    ``jax.devices()`` orders devices so that each process's addressable
    devices are contiguous — the shard a process contributes with
    ``global_corpus_from_local`` is therefore its own utterance range.
    """
    return Mesh(np.array(jax.devices()), (axis_name,))


def process_slice(n_total: int, process_id: int | None = None,
                  num_processes: int | None = None) -> tuple[int, int]:
    """[start, stop) utterance range this process should load from disk.

    Splits as evenly as possible; the first ``n_total % P`` processes get one
    extra utterance.  ``global_corpus_from_local`` pads each local shard to a
    common per-process size, so uneven splits are fine.
    """
    if process_id is None:
        process_id = jax.process_index()
    if num_processes is None:
        num_processes = jax.process_count()
    base, extra = divmod(n_total, num_processes)
    start = process_id * base + min(process_id, extra)
    stop = start + base + (1 if process_id < extra else 0)
    return start, stop


def global_corpus_from_local(
    local: Corpus, mesh: Mesh, axis_name: str = DATA_AXIS
) -> Corpus:
    """Assemble per-process corpus shards into one globally-sharded Corpus.

    Every process passes the shard it loaded (its ``process_slice``); the
    result is a pytree of global ``jax.Array``s with sharding
    ``P(axis_name)`` over ``mesh``.  No host ever holds the whole corpus and
    no data crosses hosts — each process's rows land on its own devices.

    Local shards may differ in N by up to the padding amount: all are padded
    (zero-length utterances) to the same per-process size, a multiple of the
    per-process device count.  Padded-axis lengths (Ts/Tt) and vocab sizes
    must already agree across processes — they are corpus-level constants
    the data layer derives from the full manifest, not from the shard.
    """
    n_dev_total = mesh.shape[axis_name]
    n_proc = jax.process_count()
    if n_dev_total % n_proc != 0:
        raise ValueError(
            f"mesh has {n_dev_total} devices over {n_proc} processes — "
            "per-process device counts must be equal"
        )
    per_proc_dev = n_dev_total // n_proc
    # All processes must agree on the padded per-process N: take the max
    # local N over processes, then round up to the local device count.
    from jax.experimental import multihost_utils

    n_local = multihost_utils.process_allgather(np.int32(local.n))
    n_per_proc = pad_to_multiple(int(np.max(n_local)), per_proc_dev)
    padded = local.pad_to(n_per_proc)
    sharding = NamedSharding(mesh, P(axis_name))

    def mk(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(mk, padded)


def replicate_to_global(pytree, mesh: Mesh):
    """Turn host-local (identical-on-every-process) arrays into replicated
    global arrays on ``mesh`` — e.g. params built by a deterministic
    ``init`` before the first step."""
    from jax.experimental import multihost_utils

    return multihost_utils.host_local_array_to_global_array(
        pytree, mesh, P()
    )


def train_streaming_multihost(
    mod,
    params,
    reader,
    num_iterations: int,
    mesh: Mesh | None = None,
    count_kwargs: dict | None = None,
    m_step_kwargs: dict | None = None,
    axis_name: str = DATA_AXIS,
    prefetch: int = 1,
    on_iteration=None,
):
    """Pod-scale out-of-core EM: every process streams ITS OWN shard subset.

    Composition of ``data/stream.py`` (exact streamed counts) with the
    process-spanning mesh: in round ``r`` process ``p`` mmap-loads shard
    ``r*P + p`` from its reader (a shared filesystem or a per-host copy of
    the shard directory), the P local shards are assembled into one global
    round-corpus of ``P * shard_size`` utterances, and a single jitted
    E-step computes its counts (GSPMD inserts the cross-host reduction).
    ceil(K/P) rounds cover the corpus; processes past the last shard
    contribute an all-zero shard (zero-length utterances add zero counts —
    the same invariant corpus padding relies on everywhere).  One replicated
    M-step per iteration.  Exact: identical to resident full-batch EM up to
    float addition order.

    Host residency per process: O(shard).  HBM per device:
    O(shard_size / local_device_count) utterances of activations.

    ``params`` may be host-local (identical on every process, e.g. from a
    deterministic init or a restored checkpoint) — they are lifted to
    replicated global arrays here.  Returns (params, [loglik/iter]).
    """
    from multimodalworddiscovery_tpu.data.stream import FIELDS

    if mesh is None:
        mesh = global_mesh(axis_name)
    ckw = dict(count_kwargs or {})
    mkw = dict(m_step_kwargs or {})
    n_proc = jax.process_count()
    pid = jax.process_index()
    per_proc_dev = mesh.shape[axis_name] // max(n_proc, 1)
    if reader.shard_size % max(per_proc_dev, 1) != 0:
        raise ValueError(
            f"shard_size {reader.shard_size} must divide by the per-process "
            f"device count {per_proc_dev} — re-shard with `mwd shard "
            f"--shard-size <multiple of {per_proc_dev}>`"
        )
    rounds = -(-reader.num_shards // n_proc)
    sharding = NamedSharding(mesh, P(axis_name))

    def local_arrays(k: int) -> dict:
        if k < reader.num_shards:
            return {
                f: np.ascontiguousarray(
                    np.load(reader.directory / f"{f}_{k}.npy", mmap_mode="r")
                )
                for f in FIELDS
            }
        return {  # past the end: zero-length utterances, zero counts
            f: np.zeros_like(
                np.load(reader.directory / f"{f}_0.npy", mmap_mode="r")
            )
            for f in FIELDS
        }

    from multimodalworddiscovery_tpu.data.corpus import Corpus

    def round_corpus_from(loc: dict) -> Corpus:
        return Corpus(
            src=jax.make_array_from_process_local_data(sharding, loc["src"]),
            src_len=jax.make_array_from_process_local_data(sharding, loc["src_len"]),
            trg=jax.make_array_from_process_local_data(sharding, loc["trg"]),
            trg_len=jax.make_array_from_process_local_data(sharding, loc["trg_len"]),
            src_vocab=reader.src_vocab,
            trg_vocab=reader.trg_vocab,
        )

    from multimodalworddiscovery_tpu.data.stream import (
        _jitted_step,
        prefetched,
        tree_sum_bounded,
    )

    params = replicate_to_global(params, mesh)
    # outputs pinned REPLICATED: an unconstrained m_step output could stay
    # sharded over 'data' (GSPMD's choice), and the coordinator's host-copy
    # checkpoint would then hit non-addressable shards
    repl = NamedSharding(mesh, P())
    count_fn = _jitted_step(
        mod, "expected_counts", tuple(sorted(ckw.items())), out_shardings=repl
    )
    m_fn = _jitted_step(mod, "m_step", tuple(sorted(mkw.items())), out_shardings=repl)

    def per_round():
        # prefetch thread mmap-reads the NEXT round's local shard while the
        # device computes this one's counts (only the host file read runs on
        # the thread; global-array assembly is a collective-adjacent call
        # and stays on the main thread)
        for loc in prefetched(
            lambda r: local_arrays(r * n_proc + pid), rounds, prefetch
        ):
            yield count_fn(params, round_corpus_from(loc))

    lls = []
    for it in range(num_iterations):
        counts, ll = tree_sum_bounded(per_round())
        params = m_fn(params, counts)
        lls.append(float(ll))
        if on_iteration is not None:
            on_iteration(it, params, lls[-1])
    return params, lls
