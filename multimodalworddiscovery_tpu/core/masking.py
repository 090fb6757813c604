"""Padding / masking helpers for variable-length utterances.

The reference processes one ragged utterance at a time in Python (SURVEY.md
§3.1); here the whole corpus is a padded dense tensor and every op is masked.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def lengths_to_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[N] lengths -> [N, max_len] bool mask (True = valid position)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)
    return pos[None, :] < lengths[:, None]


def pair_mask(src_mask: jax.Array, trg_mask: jax.Array) -> jax.Array:
    """[N,Ts] x [N,Tt] -> [N,Ts,Tt] joint validity mask."""
    return src_mask[:, :, None] & trg_mask[:, None, :]


def pad_and_stack(
    seqs: Sequence[np.ndarray],
    pad_value: float | int = 0,
    max_len: int | None = None,
    dtype=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Stack ragged [T_i, ...] arrays into ([N, T, ...], lengths[N]).

    Host-side (NumPy): runs once at corpus-build time, never inside jit.
    """
    seqs = [np.asarray(s) for s in seqs]
    lengths = np.array([s.shape[0] for s in seqs], dtype=np.int32)
    T = int(max_len if max_len is not None else (lengths.max() if len(seqs) else 0))
    trailing = seqs[0].shape[1:] if seqs else ()
    if dtype is None:
        dtype = seqs[0].dtype if seqs else np.float32
    out = np.full((len(seqs), T, *trailing), pad_value, dtype=dtype)
    for i, s in enumerate(seqs):
        t = min(s.shape[0], T)
        out[i, :t] = s[:t]
    return out, np.minimum(lengths, T)


def bucket_by_length(lengths: np.ndarray, bucket_edges: Sequence[int]) -> np.ndarray:
    """Assign each utterance to a length bucket to limit padding waste.

    Returns bucket index per utterance; edges are inclusive upper bounds.
    """
    return np.searchsorted(np.asarray(bucket_edges), np.asarray(lengths), side="left")
