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


def chunked_expected_counts(
    mod: ModuleType,
    params,
    corpus: Corpus,
    num_chunks: int,
    use_pallas: bool = False,
    **estep_kwargs,
):
    """E-step over ``num_chunks`` corpus slices inside ONE jitted scan,
    accumulating the additive counts — activation memory drops by
    ``num_chunks`` (the [N,Ts,S] posteriors / one-hot count intermediates are
    per-chunk), so EM runs on corpora whose activations exceed HBM
    (measured: 600k utterances OOMed 15.85/15.75 GB unchunked; fits chunked).

    Returns (counts, loglik) exactly equal to the unchunked E-step (padding
    chunks contribute zero: zero-length utterances have loglik 0 and zero
    posteriors).  jit-compatible; corpus size need not divide num_chunks.
    """
    import jax.numpy as jnp

    n = corpus.n
    per = -(-n // num_chunks)  # ceil
    padded = corpus.pad_to(per * num_chunks)

    def reshape(x):
        return x.reshape((num_chunks, per) + x.shape[1:])

    chunks = Corpus(
        src=reshape(padded.src),
        src_len=reshape(padded.src_len),
        trg=reshape(padded.trg),
        trg_len=reshape(padded.trg_len),
        src_vocab=corpus.src_vocab,
        trg_vocab=corpus.trg_vocab,
    )

    def estep(c):
        # estep_kwargs flow through (e.g. hmm_gaussian's emit_scale annealing
        # temperature — a traced scalar is fine, counts stay additive)
        if _supports_pallas(mod):
            return mod.expected_counts(
                params, c, use_pallas=use_pallas, **estep_kwargs
            )
        return mod.expected_counts(params, c, **estep_kwargs)

    def body(acc, leaves):
        c = Corpus(
            src=leaves[0], src_len=leaves[1], trg=leaves[2], trg_len=leaves[3],
            src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
        )
        out = estep(c)
        return jax.tree.map(jnp.add, acc, out), None

    zero = jax.tree.map(
        lambda t: jnp.zeros(t.shape, t.dtype),
        jax.eval_shape(
            lambda: estep(
                Corpus(
                    src=chunks.src[0], src_len=chunks.src_len[0],
                    trg=chunks.trg[0], trg_len=chunks.trg_len[0],
                    src_vocab=corpus.src_vocab, trg_vocab=corpus.trg_vocab,
                )
            )
        ),
    )
    (counts, ll), _ = jax.lax.scan(
        body, zero, (chunks.src, chunks.src_len, chunks.trg, chunks.trg_len)
    )
    return counts, ll


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
