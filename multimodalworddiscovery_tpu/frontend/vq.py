"""k-means VQ frontend: continuous frames -> discrete code corpora.

Reference counterpart: SURVEY.md §2 C5 — the SMT mixture aligner "works on
discrete phones or on continuous features via Gaussian/k-means softening".
This is the k-means-softening half for the DISCRETE-emission aligners
(model1 / hmm): fit a codebook over the masked frames, replace each frame
with its code id, and the whole discrete pipeline (EM, decode, segmentation,
lexicon) runs unchanged — the time axis is preserved, so gold frame
alignments and segment boundaries stay valid.

The codebook is a model artifact: the CLI persists it in the workdir
(``vq_codebook.npy``) at train time and reloads it for decode/eval, so a
restarted process quantizes with the SAME centroids (assignment is
deterministic given the codebook).

TPU shape: fitting and assignment reuse the Gaussian module's Lloyd's
kernels (one MXU matmul per sweep, one-hot centroid updates, frame matrix
as a jit ARGUMENT — see ``hmm_gaussian._kmeans_fit``).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.data.corpus import Corpus
from multimodalworddiscovery_tpu.models.hmm_gaussian import _kmeans_assign


def fit_codebook(
    corpus: Corpus,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
) -> jax.Array:
    """Delegates to the ONE resident fit protocol
    (``hmm_gaussian.fit_frame_codebook``), shared with ``quantize_frames``
    so the frontend's and the VQ-teacher's code spaces can never drift."""
    from multimodalworddiscovery_tpu.models.hmm_gaussian import (
        fit_frame_codebook,
    )

    return fit_frame_codebook(
        corpus, n_codes=n_codes, num_iterations=num_iterations, key=key
    )


def fit_codebook_streaming(
    reader,
    n_codes: int = 64,
    num_iterations: int = 10,
    key: jax.Array | None = None,
    n_sample: int = 65536,
    frames=None,
) -> jax.Array:
    """Out-of-core codebook — delegates to the ONE streaming fit protocol
    (``hmm_gaussian.fit_codebook_reservoir``), shared with the VQ-teacher
    seeding so the two recipes' code spaces can never drift apart.

    ``frames``: a pre-drawn canonical reservoir (the multihost merged one)
    — see ``fit_codebook_reservoir``."""
    from multimodalworddiscovery_tpu.models.hmm_gaussian import (
        fit_codebook_reservoir,
    )

    return fit_codebook_reservoir(
        reader, n_codes=n_codes, num_iterations=num_iterations, key=key,
        n_sample=n_sample, frames=frames,
    )


def quantize(corpus: Corpus, codebook: jax.Array) -> Corpus:
    """Replace each frame with its nearest-centroid code id -> a DISCRETE
    corpus (``src_vocab`` = codebook rows; lengths/targets unchanged)."""
    codes = jax.jit(_kmeans_assign)(
        codebook, corpus.src.reshape(-1, corpus.src.shape[-1])
    )
    return Corpus(
        src=codes.reshape(corpus.src.shape[:2]).astype(jnp.int32),
        src_len=corpus.src_len,
        trg=corpus.trg,
        trg_len=corpus.trg_len,
        src_vocab=int(codebook.shape[0]),
        trg_vocab=corpus.trg_vocab,
    )


def save_codebook(path: str | Path, codebook: jax.Array) -> None:
    """Atomic write (tmp + rename): a concurrent reader — e.g. another
    process of a distributed job racing the coordinator's save — sees either
    no file (and fits the identical codebook deterministically) or a
    complete one, never a truncated .npy."""
    import os

    path = Path(path)
    tmp = path.with_suffix(".npy.tmp.npy")
    np.save(tmp, np.asarray(codebook))
    os.replace(tmp, path)


def load_codebook(path: str | Path) -> jax.Array:
    return jnp.asarray(np.load(Path(path)))
