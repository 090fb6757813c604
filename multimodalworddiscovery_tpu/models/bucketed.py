"""Exact length-bucketed EM.

For raggedly-sized corpora, running the E-step per length bucket and pooling
the (additive) expected counts before ONE M-step is mathematically identical
to EM over a single max-padded tensor — but each bucket only pays for its own
padding (data/bucketing.py).  Works for any aligner module exposing
``expected_counts(params, corpus) -> (counts_pytree, loglik)`` and
``m_step(params, counts)`` (model1, hmm).
"""

from __future__ import annotations

from types import ModuleType

import jax
import numpy as np

from multimodalworddiscovery_tpu.data.bucketing import bucket_corpus
from multimodalworddiscovery_tpu.data.corpus import Corpus


def train_bucketed(
    mod: ModuleType,
    params,
    corpus: Corpus,
    bucket_edges: list[int],
    num_iterations: int,
    smoothing: float = 1e-8,
):
    """EM over length buckets; returns (params, logliks list).

    Each bucket's E-step compiles once (one shape per bucket); counts are
    pooled with tree arithmetic, then a single M-step per iteration.
    """
    buckets = bucket_corpus(corpus, bucket_edges)
    e_steps = [jax.jit(mod.expected_counts) for _ in buckets]
    m = jax.jit(lambda p, c: mod.m_step(p, c, smoothing))

    logliks = []
    for _ in range(num_iterations):
        total_counts = None
        total_ll = 0.0
        for (bucket, _idx), e in zip(buckets, e_steps):
            counts, ll = e(params, bucket)
            total_ll += float(ll)
            total_counts = (
                counts
                if total_counts is None
                else jax.tree.map(lambda a, b: a + b, total_counts, counts)
            )
        params = m(params, total_counts)
        logliks.append(total_ll)
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
