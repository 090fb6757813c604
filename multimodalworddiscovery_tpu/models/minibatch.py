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


def make_minibatch_step(
    step_fn: StepFn,
    corpus: Corpus,
    batch_size: int,
    mesh=None,
    axis_name: str = DATA_AXIS,
):
    """jitted ``(state, key) -> (state, stats)`` sampling a fresh minibatch.

    ``step_fn(state, batch) -> (state, stats)`` is any model step (its guide /
    teacher logic runs inside, per batch).  With ``mesh`` the batch is
    sharded over the data axis and the state kept replicated — XLA inserts
    the gradient all-reduce.  batch_size must be a multiple of the mesh size.
    """
    n = corpus.n
    if batch_size > n:
        raise ValueError(f"batch_size {batch_size} > corpus size {n}")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.shape[axis_name]:
            raise ValueError(
                f"batch_size {batch_size} not divisible by mesh size "
                f"{mesh.shape[axis_name]}"
            )
        batch_sharding = NamedSharding(mesh, P(axis_name))
        repl = NamedSharding(mesh, P())

    def step(state, key):
        # uniform without replacement: prefix of a random permutation
        idx = jax.random.permutation(key, n)[:batch_size]
        batch = gather_batch(corpus, idx)
        if mesh is not None:
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
                batch,
            )
        return step_fn(state, batch)

    if mesh is not None:
        return jax.jit(step, in_shardings=(repl, None), out_shardings=(repl, repl))
    return jax.jit(step)


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
