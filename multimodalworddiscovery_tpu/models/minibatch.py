"""Minibatch training for the gradient-based aligners (attention, grounding).

The reference trains its neural models with per-utterance/epoch Python loops
(SURVEY.md §3.3 🔥).  Round 1 replaced that with FULL-batch jitted steps —
which cannot scale to SpeechCOCO/MSCOCO-sized corpora (BASELINE configs #3/#4:
100k+ utterances of frames; a full [N,Tt,Ts] attention step or [N,N,Ts,Tt]
grounding matchmap does not fit HBM).  This module adds the TPU-native scaling
story:

* the corpus stays DEVICE-RESIDENT (optionally sharded over the data mesh
  axis) — no host dataloader round-trips;
* each step gathers a static-shape random minibatch on device
  (`jax.random.permutation` prefix -> one gather, which XLA turns into the
  right collectives when the corpus is sharded);
* the model step runs on the minibatch; with a mesh, the batch is
  sharding-constrained over the data axis and gradients all-reduce via the
  replicated output sharding;
* teacher signals (e.g. the HMM guide matrix for guided attention) are
  computed PER BATCH inside the same jitted step from the teacher's
  parameters, so guided attention composes with both minibatching and
  data parallelism (removing round-1's `data_parallel` exclusion).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from multimodalworddiscovery_tpu.core.mesh import DATA_AXIS
from multimodalworddiscovery_tpu.data.corpus import Corpus

StepFn = Callable[[Any, Corpus], tuple[Any, dict]]


def gather_batch(corpus: Corpus, idx: jax.Array) -> Corpus:
    """Static-shape minibatch: one on-device gather per corpus leaf."""
    take = lambda x: jnp.take(x, idx, axis=0)
    return Corpus(
        src=take(corpus.src),
        src_len=take(corpus.src_len),
        trg=take(corpus.trg),
        trg_len=take(corpus.trg_len),
        src_vocab=corpus.src_vocab,
        trg_vocab=corpus.trg_vocab,
    )


def sample_local_batch(
    corpus: Corpus,
    key: jax.Array,
    batch_size: int,
    mesh,
    axis_name: str = DATA_AXIS,
):
    """Per-device stratified minibatch: each device samples batch_size/D rows
    uniformly WITHOUT replacement from its OWN corpus shard (per-device key =
    fold_in(key, device index)), so the gather never leaves the device.

    This is the pod-scale sampling scheme: a globally-uniform gather from a
    cross-host-sharded corpus would make GSPMD exchange corpus rows over DCN
    every step (or worse, all-gather the operand).  Stratified-by-shard is
    statistically equivalent for SGD when shards are uniform random subsets
    of the corpus — a property the WRITER must supply, not an assumption:
    real corpora are ordered (by image/speaker/length), so shard with
    ``data.stream.write_shards(..., shuffle=seed)`` (or load slices of an
    order-free corpus).

    Zero-length PADDING rows (``global_corpus_from_local`` pads uneven
    process slices) sort strictly after real rows in the per-device draw, so
    a device only ever emits padding when its shard holds fewer than
    batch_size/D real rows.  (Per-process padding is at most the per-process
    device count, so only a pathological split — a process whose entire tail
    device is padding — can still leak padded rows into a batch.)
    """
    n_dev = mesh.shape[axis_name]
    if batch_size % n_dev:
        raise ValueError(
            f"batch_size {batch_size} not divisible by mesh size {n_dev}"
        )
    b_local = batch_size // n_dev
    if b_local > corpus.n // n_dev:
        # permutation-prefix sampling cannot fill the per-device share from
        # a smaller shard — it would silently return a short batch
        raise ValueError(
            f"batch_size/device {b_local} exceeds the per-device corpus "
            f"shard of {corpus.n // n_dev} rows"
        )

    def shard_sample(c_shard: Corpus, k):
        d = jax.lax.axis_index(axis_name)
        n_local = c_shard.src.shape[0]
        # real rows (src_len > 0) sort strictly before the zero-length padding
        # rows that global_corpus_from_local adds for uneven process slices;
        # within each group the random keys give a uniform permutation — so
        # this is uniform-without-replacement over the shard's REAL rows
        # whenever enough exist (mirrors sample='valid''s padding exclusion:
        # degenerate all-zero rows dilute batches and feed constant rows into
        # contrastive losses)
        u = jax.random.uniform(jax.random.fold_in(k, d), (n_local,))
        pad_penalty = jnp.where(c_shard.src_len > 0, 0.0, 2.0)
        idx = jnp.argsort(u + pad_penalty)[:b_local]
        return gather_batch(c_shard, idx)

    from jax.sharding import PartitionSpec as P

    return jax.shard_map(
        shard_sample,
        mesh=mesh,
        in_specs=(P(axis_name), P()),
        out_specs=P(axis_name),
        check_vma=False,  # fold_in of the replicated key is fine per device
    )(corpus, key)


def make_minibatch_step(
    step_fn: StepFn,
    corpus: Corpus,
    batch_size: int,
    mesh=None,
    axis_name: str = DATA_AXIS,
    sample: str = "global",
    bind_corpus: bool = True,
):
    """jitted ``(state, key) -> (state, stats)`` sampling a fresh minibatch.

    ``step_fn(state, batch) -> (state, stats)`` is any model step (its guide /
    teacher logic runs inside, per batch).  With ``mesh`` the batch is
    sharded over the data axis and the state kept replicated — XLA inserts
    the gradient all-reduce.  batch_size must be a multiple of the mesh size.

    ``sample="global"`` draws uniformly from the whole corpus (single-host
    default; the gather may cross devices).  ``sample="local"`` draws each
    device's share from its own shard (`sample_local_batch`) — REQUIRED on
    multi-host meshes, where a global gather would cross DCN every step.
    """
    n = corpus.n
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > corpus size {n}")
    if sample not in ("global", "local", "valid"):
        raise ValueError(f"sample must be global|local|valid, got {sample!r}")
    if sample == "local" and mesh is None:
        raise ValueError("sample='local' requires a mesh")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.shape[axis_name]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{mesh.shape[axis_name]}"
            )
        batch_sharding = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())

    # the corpus is an ARGUMENT of the jitted step, not a closure constant:
    # global arrays spanning other processes' devices cannot be closed over
    # (and passing it as an operand keeps its sharding authoritative)
    def step(state, key, c):
        if sample == "local":
            batch = sample_local_batch(c, key, batch_size, mesh, axis_name)
        elif sample == "valid":
            # uniform over REAL rows only (with replacement): a shard padded
            # with zero-length utterances (streaming's last shard) must not
            # burn steps on all-padding batches or feed degenerate rows to
            # contrastive losses.  Every shard holds >= 1 real row.
            probs = (c.src_len > 0).astype(jnp.float32)
            idx = jax.random.choice(
                key, n, (batch_size,), replace=True, p=probs / jnp.sum(probs)
            )
            batch = gather_batch(c, idx)
        else:
            # uniform without replacement: prefix of a random permutation
            idx = jax.random.permutation(key, n)[:batch_size]
            batch = gather_batch(c, idx)
        if mesh is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                batch,
            )
        return step_fn(state, batch)

    if mesh is not None:
        jitted = jax.jit(
            step, in_shardings=(repl, None, None), out_shardings=(repl, repl)
        )
    else:
        jitted = jax.jit(step)
    if not bind_corpus:
        # ``(state, key, corpus) -> (state, stats)``: ONE jit reused across
        # same-shape corpora (the streaming trainer feeds a different shard
        # each call; ``corpus`` served only as the shape/validation template)
        return jitted
    return lambda state, key: jitted(state, key, corpus)


def train_minibatch_streaming(
    step_fn: StepFn,
    state,
    reader,
    batch_size: int,
    num_steps: int,
    key: jax.Array | None = None,
    steps_per_shard: int | None = None,
    prefetch: int = 1,
    mesh=None,
    start_step: int = 0,
    on_step=None,
):
    """Out-of-core minibatch SGD for the gradient models: mmap shards stream
    to the device (data/stream.prefetched overlaps the I/O), and
    ``steps_per_shard`` minibatch steps sample WITHIN the resident shard
    before the next one loads — the classic big-data loader pattern.
    Shards are visited cyclically until ``num_steps`` steps have run.

    Sampling is uniform over the resident shard's REAL rows (padding rows of
    the last shard excluded; cross-shard uniformity would re-read the disk
    every step); with ``steps_per_shard ~= shard_size/batch_size`` every
    example is seen ~once per cycle, the standard approximation for corpora
    beyond RAM.  This is unbiased only when shards are uniform random
    subsets: shard ORDERED corpora with ``write_shards(..., shuffle=seed)``
    or steps_per_shard consecutive batches all come from one contiguous
    corpus slice (convergence-parity test: tests/test_stream.py).

    Deterministic resume: the step key is ``fold_in(key, global_step)`` and
    the shard cycle position is derived from the global step, so restarting
    from a checkpoint with ``start_step`` continues the exact schedule
    instead of replaying shard 0 with the original key.

    With ``mesh``, each shard is sharded over the data axis and gradients
    all-reduce (state replicated) — same semantics as the resident
    data-parallel minibatch path.

    Returns (state, losses).  ``reader`` is a data.stream.ShardedCorpusReader;
    ``on_step(global_step, state, loss)`` runs after every step.
    """
    from multimodalworddiscovery_tpu.data.stream import prefetched

    if key is None:
        key = jax.random.PRNGKey(0)
    if steps_per_shard is None:
        steps_per_shard = max(1, reader.shard_size // batch_size)
    sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from multimodalworddiscovery_tpu.core.mesh import DATA_AXIS

        if reader.shard_size % mesh.shape[DATA_AXIS] != 0:
            raise ValueError(
                f"shard_size {reader.shard_size} must divide by the mesh's "
                f"{mesh.shape[DATA_AXIS]} devices"
            )
        sharding = NamedSharding(mesh, P(DATA_AXIS))
    shard0 = reader.load_shard(0, sharding)
    step = make_minibatch_step(
        step_fn, shard0, batch_size, mesh=mesh, sample="valid",
        bind_corpus=False,
    )  # one jit; every shard has the same padded shape

    stop = start_step + num_steps
    first_block = start_step // steps_per_shard
    last_block = max((stop - 1) // steps_per_shard, first_block)
    blocks = list(range(first_block, last_block + 1))

    def load(j):
        k = blocks[j] % reader.num_shards
        return shard0 if k == 0 else reader.load_shard(k, sharding)

    losses: list[float] = []
    it = start_step
    for b, shard in zip(blocks, prefetched(load, len(blocks), prefetch)):
        block_stop = min((b + 1) * steps_per_shard, stop)
        while it < block_stop:
            state, stats = step(state, jax.random.fold_in(key, it), shard)
            losses.append(float(stats["loglik"]))
            if on_step is not None:
                on_step(it, state, losses[-1])
            it += 1
    return state, losses


def train_minibatch(
    step_fn: StepFn,
    state,
    corpus: Corpus,
    batch_size: int,
    num_steps: int,
    key: jax.Array | None = None,
    mesh=None,
    steps_per_call: int = 1,
):
    """Convenience loop: ``num_steps`` minibatch steps, returns (state, losses).

    steps_per_call > 1 fuses that many steps into one lax.scan dispatch
    (amortizes relay/dispatch latency on TPU benchmarking paths).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    one = make_minibatch_step(step_fn, corpus, batch_size, mesh=mesh)

    logliks = []
    if steps_per_call > 1:

        def body(s, k):
            s2, stats = one(s, k)
            return s2, stats["loglik"]

        scan = jax.jit(lambda s, ks: jax.lax.scan(body, s, ks))
        for _ in range(num_steps // steps_per_call):
            key, sub = jax.random.split(key)
            ks = jax.random.split(sub, steps_per_call)
            state, lls = scan(state, ks)
            logliks.extend(jnp.asarray(lls).tolist())

    # remainder steps (and the whole run when steps_per_call == 1)
    for _ in range(num_steps - len(logliks)):
        key, sub = jax.random.split(key)
        state, stats = one(state, sub)
        logliks.append(float(stats["loglik"]))
    return state, logliks
