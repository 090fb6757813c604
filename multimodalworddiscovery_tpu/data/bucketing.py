"""Length bucketing: split a corpus into padded buckets to cut padding waste.

SURVEY.md §7 hard parts: "bucketing by length to limit padding waste".  For
corpora with very ragged utterance lengths, EM over one max-padded tensor
wastes compute on padding; expected counts are ADDITIVE, so running the
E-step per bucket and pooling counts before one M-step is exactly equivalent
(tests assert this).  Each bucket compiles once per shape.
"""

from __future__ import annotations

import numpy as np

from multimodalworddiscovery_tpu.data.corpus import Corpus


def bucket_corpus(
    corpus: Corpus, bucket_edges: list[int], min_bucket_size: int = 1
) -> list[tuple[Corpus, np.ndarray]]:
    """Split by source length.  Returns [(bucket corpus, original indices)].

    bucket_edges: ascending inclusive upper bounds on src_len; utterances
    longer than the last edge go into a final overflow bucket.  Each bucket
    is re-padded to its own max length (trg axis keeps the global max so
    model shapes stay consistent across buckets).
    """
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    src_len = np.asarray(corpus.src_len)
    trg_len = np.asarray(corpus.trg_len)

    edges = list(bucket_edges) + [int(src_len.max(initial=1))]
    out: list[tuple[Corpus, np.ndarray]] = []
    lo = 0
    assigned = np.zeros(corpus.n, dtype=bool)
    for edge in edges:
        sel = (~assigned) & (src_len <= edge)
        idx = np.where(sel)[0]
        if len(idx) < min_bucket_size:
            # too small for its own bucket: leave unassigned so these fall
            # into a later bucket (or the final rest bucket) — never dropped
            continue
        assigned |= sel
        max_t = max(int(src_len[idx].max(initial=1)), 1)
        sub = Corpus(
            src=corpus.src[idx][:, :max_t]
            if corpus.src.ndim == 2
            else corpus.src[idx][:, :max_t, :],
            src_len=corpus.src_len[idx],
            trg=corpus.trg[idx],
            trg_len=corpus.trg_len[idx],
            src_vocab=corpus.src_vocab,
            trg_vocab=corpus.trg_vocab,
        )
        out.append((sub, idx))
    # anything missed (all buckets under min size) -> one final bucket
    rest = np.where(~assigned)[0]
    if len(rest):
        out.append(
            (
                Corpus(
                    src=corpus.src[rest],
                    src_len=corpus.src_len[rest],
                    trg=corpus.trg[rest],
                    trg_len=corpus.trg_len[rest],
                    src_vocab=corpus.src_vocab,
                    trg_vocab=corpus.trg_vocab,
                ),
                rest,
            )
        )
    return out


def padding_waste(corpus: Corpus) -> float:
    """Fraction of src positions that are padding."""
    src_len = np.asarray(corpus.src_len)
    total = corpus.n * corpus.max_src_len
    return 1.0 - float(src_len.sum()) / max(total, 1)
