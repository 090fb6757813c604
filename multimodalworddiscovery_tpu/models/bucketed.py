"""Exact length-bucketed EM.

For raggedly-sized corpora, running the E-step per length bucket and pooling
the (additive) expected counts before ONE M-step is mathematically identical
to EM over a single max-padded tensor — but each bucket only pays for its own
padding (data/bucketing.py).  Works for any aligner module exposing
``expected_counts(params, corpus) -> (counts_pytree, loglik)`` and
``m_step(params, counts)`` (model1, hmm, hmm_gaussian, hmm_dnn).

hmm_dnn's generalized M-step additionally trains its emission MLP; that part
is not summarized by additive counts, so modules may expose
``frame_posteriors`` + ``neural_m_step(params, [(bucket, r), ...])`` — the
per-bucket CE gradients are additive, making the bucketed neural update
identical to the unbucketed one (models/hmm_dnn.py).

Buckets can also be sharded over a device mesh (data-parallel bucketed EM):
pass ``mesh`` and each bucket is padded/sharded over the data axis, with
counts reduced across chips by XLA from the replicated output sharding.
"""

from __future__ import annotations

from types import ModuleType
from typing import Callable

import jax
import numpy as np

from multimodalworddiscovery_tpu.data.bucketing import bucket_corpus
from multimodalworddiscovery_tpu.data.corpus import Corpus


def _supports_pallas(mod: ModuleType) -> bool:
    import inspect

    return "use_pallas" in inspect.signature(mod.expected_counts).parameters


def _jit_estep(mod: ModuleType, mesh, use_pallas: bool):
    if _supports_pallas(mod):
        fn = lambda p, c: mod.expected_counts(p, c, use_pallas=use_pallas)
    else:  # model1 has no HMM recursion, hence no Pallas path
        fn = mod.expected_counts
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(fn, in_shardings=(repl, None), out_shardings=(repl, repl))


def train_bucketed(
    mod: ModuleType,
    params,
    corpus: Corpus,
    bucket_edges: list[int],
    num_iterations: int,
    smoothing: float = 1e-8,
    mesh=None,
    use_pallas: bool = False,
    on_iteration: Callable[[int, object, float], None] | None = None,
):
    """EM over length buckets; returns (params, logliks list).

    Each bucket's E-step compiles once (one shape per bucket); counts are
    pooled with tree arithmetic, then a single M-step per iteration.
    ``on_iteration(it, params, loglik)`` fires after every M-step (CLI
    checkpointing); ``mesh`` shards every bucket over the data axis.
    """
    buckets = bucket_corpus(corpus, bucket_edges)
    if mesh is not None:
        from multimodalworddiscovery_tpu.parallel import shard_corpus

        buckets = [(shard_corpus(b, mesh), idx) for b, idx in buckets]
    m = jax.jit(lambda p, c: mod.m_step(p, c, smoothing))
    neural = getattr(mod, "neural_m_step", None)
    if neural is not None:
        # neural models: frame posteriors r are computed ONCE per iteration
        # (from the pre-M-step params, matching em_step) and reused for both
        # the additive counts and the neural CE targets
        import jax.numpy as jnp

        def estep_with_r(p, c):
            r, width, logz = mod.frame_posteriors(
                p, c, use_pallas=use_pallas if _supports_pallas(mod) else False
            )
            w = c.src_mask().astype(r.dtype)[..., None]
            counts = {"prior": jnp.sum(r * w, axis=(0, 1)), "width": width}
            return r, counts, jnp.sum(logz)

        e_steps = [jax.jit(estep_with_r) for _ in buckets]
    else:
        e_steps = [_jit_estep(mod, mesh, use_pallas) for _ in buckets]

    logliks = []
    for it in range(num_iterations):
        total_counts = None
        total_ll = 0.0
        batches = []
        for (bucket, _idx), e in zip(buckets, e_steps):
            if neural is not None:
                r, counts, ll = e(params, bucket)
                batches.append((bucket, r))
            else:
                counts, ll = e(params, bucket)
            total_ll += float(ll)
            total_counts = (
                counts
                if total_counts is None
                else jax.tree.map(lambda a, b: a + b, total_counts, counts)
            )
        params = m(params, total_counts)
        if neural is not None:
            params, _ce = neural(params, batches)
        logliks.append(total_ll)
        if on_iteration is not None:
            on_iteration(it, params, total_ll)
    return params, logliks


def align_bucketed(
    mod: ModuleType, params, corpus: Corpus, bucket_edges: list[int]
) -> np.ndarray:
    """Decode per bucket, reassembled in original utterance order."""
    buckets = bucket_corpus(corpus, bucket_edges)
    out = np.zeros((corpus.n, corpus.max_src_len), np.int32)
    for bucket, idx in buckets:
        a = np.asarray(jax.jit(mod.align)(params, bucket))
        out[idx, : a.shape[1]] = a
    return out
