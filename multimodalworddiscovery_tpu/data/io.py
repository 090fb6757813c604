"""On-disk corpus format — load/save.

Mirrors the reference's inter-layer contract of files on disk (SURVEY.md §1):

  <name>_src.txt         one utterance per line, space-separated tokens
                         (phone symbols or integer ids)
  <name>_trg.txt         one line of concepts per utterance
  <name>_src_feats.npz   OR continuous features, keys "arr_<i>" ([T_i, D])
  <name>_gold.json       [{"index": i, "alignment": [...1-based trg pos, 0=NULL],
                           "segments": [[start, end_exclusive, concept_id], ...]}]

Alignment dumps written by ``align``/``evaluate`` use the same JSON shape, so
the evaluator can score either our output or reference-style dumps.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from multimodalworddiscovery_tpu.data.corpus import Corpus, GoldAnnotations


def _read_token_lines(path: Path) -> tuple[list[np.ndarray], dict[str, int]]:
    """Read whitespace-tokenized lines; build a vocab if tokens aren't ints.

    Integer tokens are used as-is; symbolic tokens get ids 1..V (0 = pad).
    """
    lines = [ln.split() for ln in path.read_text().splitlines() if ln.strip()]
    flat = {tok for ln in lines for tok in ln}
    if all(tok.lstrip("-").isdigit() for tok in flat):
        vocab: dict[str, int] = {}
        seqs = [np.asarray([int(t) for t in ln], dtype=np.int32) for ln in lines]
    else:
        vocab = {tok: i + 1 for i, tok in enumerate(sorted(flat))}
        seqs = [np.asarray([vocab[t] for t in ln], dtype=np.int32) for ln in lines]
    return seqs, vocab


def _load_int_tokens_fast(path: Path):
    """Native single-pass parse for all-integer token files; None if the file
    contains symbolic tokens (those go through the vocab-building path)."""
    import re

    text = path.read_text()
    # symbolic tokens need the vocab-building path; negative ints would be
    # mis-parsed by the native scanner (it treats '-' as a separator).  Scan
    # the FULL file at C speed (re, not a Python char loop): a '-'/alpha
    # after an all-digit head must not silently route through the native
    # parser (it would strip signs / drop tokens).
    if "-" in text or re.search(r"[^0-9\s]", text) is not None:
        return None
    from multimodalworddiscovery_tpu.native import pack_token_file

    arr, lens, vocab_max = pack_token_file(path)
    seqs = [arr[i, : lens[i]] for i in range(arr.shape[0])]
    return seqs, vocab_max + 1


def load_corpus(directory: str | Path, name: str) -> tuple[Corpus, GoldAnnotations | None]:
    """Load a corpus (and gold annotations if present) from ``directory``."""
    d = Path(directory)
    src_txt = d / f"{name}_src.txt"
    src_npz = d / f"{name}_src_feats.npz"
    if src_npz.exists():
        with np.load(src_npz) as z:
            src_seqs = [z[k] for k in sorted(z.files, key=lambda k: int(k.split("_")[-1]))]
        src_vocab = 0
    elif src_txt.exists():
        fast = _load_int_tokens_fast(src_txt)
        if fast is not None:
            src_seqs, src_vocab = fast
        else:
            src_seqs, _ = _read_token_lines(src_txt)
            src_vocab = (max((int(s.max()) for s in src_seqs if len(s)), default=0)) + 1
    else:
        raise FileNotFoundError(f"no {name}_src.txt or {name}_src_feats.npz in {d}")

    trg_txt = d / f"{name}_trg.txt"
    trg_npz = d / f"{name}_trg_feats.npz"
    if trg_npz.exists():
        with np.load(trg_npz) as z:
            trg_seqs = [z[k] for k in sorted(z.files, key=lambda k: int(k.split("_")[-1]))]
        trg_vocab = 0
    elif trg_txt.exists():
        fast = _load_int_tokens_fast(trg_txt)
        if fast is not None:
            trg_seqs, trg_vocab = fast
        else:
            trg_seqs, _ = _read_token_lines(trg_txt)
            trg_vocab = (max((int(s.max()) for s in trg_seqs if len(s)), default=0)) + 1
    else:
        raise FileNotFoundError(f"no {name}_trg.txt or {name}_trg_feats.npz in {d}")

    corpus = Corpus.from_ragged(src_seqs, trg_seqs, src_vocab=src_vocab, trg_vocab=trg_vocab)

    gold = None
    gold_path = d / f"{name}_gold.json"
    if gold_path.exists():
        gold = load_alignment_json(gold_path, corpus.n, corpus.max_src_len)
    return corpus, gold


def save_corpus(corpus: Corpus, gold: GoldAnnotations | None, directory: str | Path, name: str) -> None:
    d = Path(directory)
    d.mkdir(parents=True, exist_ok=True)
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    src_len = np.asarray(corpus.src_len)
    trg_len = np.asarray(corpus.trg_len)

    if src.ndim == 2:  # discrete tokens
        lines = [" ".join(str(int(x)) for x in src[i, : src_len[i]]) for i in range(corpus.n)]
        (d / f"{name}_src.txt").write_text("\n".join(lines) + "\n")
    else:
        np.savez(d / f"{name}_src_feats.npz", **{f"arr_{i}": src[i, : src_len[i]] for i in range(corpus.n)})
    if trg.ndim == 2:
        lines = [" ".join(str(int(x)) for x in trg[i, : trg_len[i]]) for i in range(corpus.n)]
        (d / f"{name}_trg.txt").write_text("\n".join(lines) + "\n")
    else:
        np.savez(d / f"{name}_trg_feats.npz", **{f"arr_{i}": trg[i, : trg_len[i]] for i in range(corpus.n)})

    if gold is not None:
        save_alignment_json(gold.alignment, np.asarray(corpus.src_len), d / f"{name}_gold.json", segments=gold.segments)


def save_alignment_json(
    alignment: np.ndarray,
    src_len: np.ndarray,
    path: str | Path,
    segments: list[list[tuple[int, int, int]]] | None = None,
) -> None:
    """Dump alignments (reference-style JSON alignment dump, SURVEY.md §3.1)."""
    recs = []
    for i in range(alignment.shape[0]):
        rec: dict = {
            "index": i,
            "alignment": [int(a) for a in alignment[i, : int(src_len[i])]],
        }
        if segments is not None:
            rec["segments"] = [[int(s), int(e), int(c)] for (s, e, c) in segments[i]]
        recs.append(rec)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text(json.dumps(recs, indent=1))


def load_alignment_json(path: str | Path, n: int, max_src_len: int) -> GoldAnnotations:
    recs = json.loads(Path(path).read_text())
    alignment = np.zeros((n, max_src_len), dtype=np.int32)
    segments: list[list[tuple[int, int, int]]] = [[] for _ in range(n)]
    for rec in recs:
        i = rec["index"]
        a = rec["alignment"][:max_src_len]
        alignment[i, : len(a)] = a
        segments[i] = [tuple(s) for s in rec.get("segments", [])]
    return GoldAnnotations(alignment=alignment, segments=segments)
