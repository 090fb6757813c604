"""Reference parity harness — ready for the day /root/reference/ populates.

The reference mount has been EMPTY every session so far (SURVEY.md §0), so
alignment-JSON conventions, NULL handling and metric definitions were built
from the survey's [K]/[B] claims.  The moment real reference code/artifacts
appear, THIS script is the one-command re-check (VERDICT.md round-1 item 9):

  python scripts/reference_parity.py --reference /root/reference/outputs \
      --workdir /tmp/parity

What it does:
  1. SCAN the reference directory for recognizable artifacts:
       * phone caption text files  (one utterance per line, space-separated)
       * concept/label text files
       * alignment dumps (.json) in any of the common shapes:
           - [{"index": i, "alignment": [...]}, ...]      (ours)
           - {"alignments": [[...], ...]}                 (dict-of-lists)
           - [[...], ...]                                 (bare lists)
           - JSONL, one record per line
  2. CONVERT the caption pair into our on-disk corpus format
     (data/io.py: <name>_src.txt / <name>_trg.txt) and load it through the
     standard loaders (exactly what `mwd preprocess` produces).
  3. TRAIN our matched aligner (model1 / hmm) on that corpus.
  4. DIFF our decoded alignments against the reference dump:
       per-token agreement, alignment P/R/F1 treating the reference dump as
       gold, and (if a gold file also exists) both sides' metrics vs gold.
  5. Write a parity report JSON + non-zero exit when agreement is below
     threshold, so CI can gate on it.

Every format assumption lives in a small adapter below — when the real
layout differs, fix the adapter, not the pipeline.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


# --------------------------------------------------------------------------
# adapters: tolerant readers for reference-side artifacts
# --------------------------------------------------------------------------

def read_alignment_dump(path: Path) -> list[list[int]]:
    """Parse a reference alignment dump in any of the known shapes."""
    text = path.read_text().strip()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        # JSONL: one record per line
        data = [json.loads(ln) for ln in text.splitlines() if ln.strip()]

    if isinstance(data, dict):
        for key in ("alignments", "alignment", "data"):
            if key in data:
                data = data[key]
                break
        else:
            raise ValueError(f"{path}: dict dump without a known alignment key")

    if not isinstance(data, list) or not data:
        raise ValueError(f"{path}: empty or non-list alignment dump")

    if isinstance(data[0], dict):
        # ours / reference record style: {"index": i, "alignment": [...]}
        by_index: dict[int, list[int]] = {}
        for i, rec in enumerate(data):
            al = next(
                (rec[k] for k in ("alignment", "align", "a") if k in rec), None
            )
            if al is None:
                raise ValueError(f"{path}: record without alignment: {rec.keys()}")
            by_index[int(rec.get("index", i))] = [int(x) for x in al]
        return [by_index[i] for i in sorted(by_index)]
    if isinstance(data[0], list):
        return [[int(x) for x in al] for al in data]
    raise ValueError(f"{path}: unrecognized alignment dump shape")


def find_artifacts(ref_dir: Path) -> dict[str, list[Path]]:
    """Locate caption/alignment artifacts under the reference directory."""
    found: dict[str, list[Path]] = {"captions": [], "alignments": [], "npz": []}
    for p in sorted(ref_dir.rglob("*")):
        if not p.is_file():
            continue
        if p.suffix == ".json" and any(
            k in p.name.lower() for k in ("align", "gold")
        ):
            found["alignments"].append(p)
        elif p.suffix == ".txt" and any(
            k in p.name.lower()
            for k in ("caption", "phone", "src", "trg", "concept")
        ):
            found["captions"].append(p)
        elif p.suffix == ".npz":
            found["npz"].append(p)
    return found


def pair_captions(captions: list[Path]) -> tuple[Path, Path] | None:
    """Heuristically pick the (source=phones, target=concepts) pair."""
    srcs = [p for p in captions if any(k in p.name.lower() for k in ("src", "phone", "caption"))]
    trgs = [p for p in captions if any(k in p.name.lower() for k in ("trg", "concept", "label"))]
    if srcs and trgs:
        return srcs[0], trgs[0]
    if len(captions) >= 2:
        return captions[0], captions[1]
    return None


# --------------------------------------------------------------------------
# parity pipeline
# --------------------------------------------------------------------------

def run_parity(ref_dir: Path, workdir: Path, model_name: str, iters: int,
               threshold: float) -> dict:
    import jax
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.data.io import load_corpus
    from multimodalworddiscovery_tpu.eval.metrics import alignment_prf
    from multimodalworddiscovery_tpu.models.registry import get_model

    report: dict = {"reference": str(ref_dir), "model": model_name}
    found = find_artifacts(ref_dir)
    report["found"] = {k: [str(p) for p in v] for k, v in found.items()}
    if not found["captions"] and not found["alignments"]:
        report["status"] = "empty-or-unrecognized"
        return report

    pair = pair_captions(found["captions"])
    if pair is None:
        report["status"] = "no-caption-pair"
        return report
    src_path, trg_path = pair
    report["pair"] = [str(src_path), str(trg_path)]

    # convert into our on-disk corpus format and round-trip our loaders
    workdir.mkdir(parents=True, exist_ok=True)
    (workdir / "ref_src.txt").write_text(src_path.read_text())
    (workdir / "ref_trg.txt").write_text(trg_path.read_text())
    corpus, gold = load_corpus(workdir, "ref")
    report["corpus"] = {
        "n": corpus.n, "max_src_len": corpus.max_src_len,
        "src_vocab": corpus.src_vocab, "trg_vocab": corpus.trg_vocab,
    }

    mod = get_model(model_name)
    params = mod.init(corpus)
    params, _ = jax.jit(lambda p: mod.train(p, corpus, iters))(params)
    ours = np.asarray(mod.align(params, corpus))
    mask = np.asarray(corpus.src_mask())

    for dump in found["alignments"]:
        try:
            ref_al = read_alignment_dump(dump)
        except ValueError as e:
            report.setdefault("skipped_dumps", []).append(str(e))
            continue
        if len(ref_al) != corpus.n:
            report.setdefault("skipped_dumps", []).append(
                f"{dump}: {len(ref_al)} records != corpus n {corpus.n}"
            )
            continue
        ref_padded = np.zeros_like(ours)
        for i, al in enumerate(ref_al):
            al = al[: ours.shape[1]]
            ref_padded[i, : len(al)] = al
        agree = float((ours == ref_padded)[mask].mean())
        prf = alignment_prf(
            jnp.asarray(ours), jnp.asarray(ref_padded), jnp.asarray(mask)
        )
        report.setdefault("dumps", {})[str(dump)] = {
            "token_agreement": round(agree, 4),
            "f1_vs_reference": round(float(prf["f1"]), 4),
        }

    scores = [d["f1_vs_reference"] for d in report.get("dumps", {}).values()]
    report["best_f1"] = max(scores) if scores else None
    report["status"] = (
        "parity" if scores and max(scores) >= threshold
        else ("diverged" if scores else "no-comparable-dump")
    )
    return report


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--workdir", default="/tmp/mwd_parity")
    ap.add_argument("--model", default="hmm", choices=["model1", "hmm"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--threshold", type=float, default=0.95,
                    help="min alignment F1 vs the reference dump for parity")
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    ref_dir = Path(args.reference)
    if not ref_dir.exists() or not any(ref_dir.iterdir()):
        print(json.dumps({"status": "reference-mount-empty",
                          "reference": str(ref_dir)}))
        return

    report = run_parity(
        ref_dir, Path(args.workdir), args.model, args.iters, args.threshold
    )
    out = json.dumps(report, indent=2)
    print(out)
    if args.output:
        Path(args.output).write_text(out)
    if report["status"] not in ("parity",):
        sys.exit(1)


if __name__ == "__main__":
    main()
