"""Word segmentation: alignment matrix -> word-like units.

Reference counterpart: ``utils/postprocess.py`` alignment->word-unit grouping
(SURVEY.md §2 C10): maximal runs of source positions assigned to the same
target concept become (start, end, concept) word units; NULL-aligned runs are
not word units.  The reference does this with per-utterance Python loops; here
it is one vectorized scatter-min/max over run ids, vmapped over the corpus, so
segmentation stays on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.data.corpus import Corpus


@functools.partial(jax.jit, static_argnames=())
def segments_from_alignment(
    alignment: jax.Array, trg: jax.Array, src_len: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Group maximal same-assignment runs into word units.

    alignment: [N, Ts] int32 — 0 = NULL, j >= 1 = 1-based trg position.
    trg:       [N, Tt] int32 concept ids (used to label segments).
    src_len:   [N] int32.

    Returns (segments [N, Ts, 3] int32, seg_mask [N, Ts] bool) where each
    valid slot holds (start, end_exclusive, concept_id).  Slots are in order
    of appearance; invalid slots are zeros.  NULL runs consume a run slot but
    are masked out.
    """
    n, ts = alignment.shape

    def row(a, trg_row, length):
        t = jnp.arange(ts, dtype=jnp.int32)
        valid = t < length
        a = jnp.where(valid, a, 0)
        prev = jnp.concatenate([jnp.full((1,), -1, a.dtype), a[:-1]])
        is_start = (a != prev) & valid
        run_id = jnp.cumsum(is_start.astype(jnp.int32)) - 1
        # Invalid positions scatter into a discard slot (index ts).
        rid = jnp.where(valid, run_id, ts)
        starts = jnp.full(ts + 1, ts, jnp.int32).at[rid].min(jnp.where(valid, t, ts))
        ends = jnp.zeros(ts + 1, jnp.int32).at[rid].max(jnp.where(valid, t + 1, 0))
        vals = jnp.zeros(ts + 1, jnp.int32).at[rid].max(jnp.where(valid, a, 0))
        starts, ends, vals = starts[:ts], ends[:ts], vals[:ts]
        n_runs = jnp.sum(is_start.astype(jnp.int32))
        slot_valid = (jnp.arange(ts) < n_runs) & (vals > 0)
        trg_ext = jnp.concatenate([jnp.zeros((1,), trg_row.dtype), trg_row])
        concept = jnp.where(slot_valid, trg_ext[vals], 0)
        segs = jnp.stack(
            [
                jnp.where(slot_valid, starts, 0),
                jnp.where(slot_valid, ends, 0),
                concept.astype(jnp.int32),
            ],
            axis=-1,
        )
        return segs, slot_valid

    return jax.vmap(row)(alignment, trg, src_len)


def boundaries_from_segments(
    segments: jax.Array, seg_mask: jax.Array, max_len: int
) -> jax.Array:
    """[N, S, 3] segments -> [N, max_len + 1] bool boundary indicators.

    A boundary exists at position p if some word unit starts or ends there.
    """
    n = segments.shape[0]
    # Slot max_len+1 is a discard bucket for masked segment slots.
    out = jnp.zeros((n, max_len + 2), dtype=bool)
    discard = max_len + 1
    starts = jnp.where(seg_mask, segments[..., 0], discard)
    ends = jnp.where(seg_mask, segments[..., 1], discard)
    batch = jnp.arange(n)[:, None].repeat(segments.shape[1], 1)
    out = out.at[batch, starts].set(True)
    out = out.at[batch, ends].set(True)
    return out[:, : max_len + 1]


def segments_to_host(segments, seg_mask) -> list[list[tuple[int, int, int]]]:
    """Device segment arrays -> per-utterance python lists for JSON dumps."""
    segments = np.asarray(segments)
    seg_mask = np.asarray(seg_mask)
    out = []
    for i in range(segments.shape[0]):
        out.append(
            [tuple(int(x) for x in segments[i, s]) for s in np.where(seg_mask[i])[0]]
        )
    return out


def segment_corpus(alignment: jax.Array, corpus: Corpus):
    """Convenience wrapper used by the CLI ``segment`` entry point."""
    return segments_from_alignment(alignment, corpus.trg, corpus.src_len)
