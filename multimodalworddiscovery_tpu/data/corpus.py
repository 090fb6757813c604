"""Corpus pytrees.

The reference's "corpus" is a Python list of ragged NumPy arrays read from
``.txt`` phone captions and ``.npz`` feature archives, iterated one utterance
at a time (SURVEY.md §1: interfaces between layers are files on disk).  Here a
corpus is a single padded pytree of device arrays so every EM / training step
is one jitted, shardable call over the whole batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from multimodalworddiscovery_tpu.core.masking import lengths_to_mask, pad_and_stack


@struct.dataclass
class Corpus:
    """Padded paired corpus.

    src: [N, Ts] int32 token ids (phones) OR [N, Ts, D] float32 frames.
    trg: [N, Tt] int32 concept ids OR [N, Tt, D] float32 region embeddings.
    src_len / trg_len: [N] int32 true lengths.

    Vocab sizes are static (pytree_node=False) so they can parameterize
    table shapes under jit.
    """

    src: jax.Array
    src_len: jax.Array
    trg: jax.Array
    trg_len: jax.Array
    src_vocab: int = struct.field(pytree_node=False, default=0)
    trg_vocab: int = struct.field(pytree_node=False, default=0)

    @property
    def n(self) -> int:
        return self.src.shape[0]

    @property
    def max_src_len(self) -> int:
        return self.src.shape[1]

    @property
    def max_trg_len(self) -> int:
        return self.trg.shape[1]

    def src_mask(self) -> jax.Array:
        return lengths_to_mask(self.src_len, self.max_src_len)

    def trg_mask(self) -> jax.Array:
        return lengths_to_mask(self.trg_len, self.max_trg_len)

    def pad_to(self, n: int) -> "Corpus":
        """Pad the utterance axis to ``n`` (zero-length utterances) so the
        corpus shards evenly over a device mesh."""
        if n < self.n:
            raise ValueError(f"cannot shrink corpus from {self.n} to {n}")
        extra = n - self.n

        def pad_leading(x):
            pad = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad)

        return Corpus(
            src=pad_leading(self.src),
            src_len=pad_leading(self.src_len),
            trg=pad_leading(self.trg),
            trg_len=pad_leading(self.trg_len),
            src_vocab=self.src_vocab,
            trg_vocab=self.trg_vocab,
        )

    @classmethod
    def from_ragged(
        cls,
        src_seqs,
        trg_seqs,
        src_vocab: int = 0,
        trg_vocab: int = 0,
        max_src_len: int | None = None,
        max_trg_len: int | None = None,
    ) -> "Corpus":
        src, src_len = pad_and_stack(src_seqs, max_len=max_src_len)
        trg, trg_len = pad_and_stack(trg_seqs, max_len=max_trg_len)
        if src.dtype.kind in "iu":
            src = src.astype(np.int32)
        else:
            src = src.astype(np.float32)
        if trg.dtype.kind in "iu":
            trg = trg.astype(np.int32)
        else:
            trg = trg.astype(np.float32)
        return cls(
            src=jnp.asarray(src),
            src_len=jnp.asarray(src_len),
            trg=jnp.asarray(trg),
            trg_len=jnp.asarray(trg_len),
            src_vocab=src_vocab,
            trg_vocab=trg_vocab,
        )


@dataclasses.dataclass
class GoldAnnotations:
    """Host-side gold labels for evaluation.

    alignment: [N, Ts] int32 — for each source token, the 1-based position of
      the aligned target concept in that utterance's trg sequence; 0 = NULL.
      (Matches the reference's alignment-JSON convention of per-token indices,
      SURVEY.md §1 "gold alignments".)
    segments: per utterance, list of (start, end_exclusive, concept_id) word
      units — the gold word segmentation.
    """

    alignment: np.ndarray
    segments: list[list[tuple[int, int, int]]]

    @property
    def n(self) -> int:
        return self.alignment.shape[0]
