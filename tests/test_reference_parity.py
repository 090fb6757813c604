"""Readiness kit for the reference mount populating (VERDICT round-1 item 9):
scripts/reference_parity.py against MOCKED reference layouts."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "reference_parity",
    Path(__file__).parent.parent / "scripts" / "reference_parity.py",
)
rp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rp)


def _mock_reference(tmp_path, fmt="records"):
    """Fabricate a reference-style output dir from the synthetic corpus."""
    import jax

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.models import hmm

    corpus, gold, _ = make_flickr8k_mini(n_utterances=30, seed=21)
    ref = tmp_path / "reference_out"
    ref.mkdir()
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    (ref / "phone_captions.txt").write_text(
        "\n".join(" ".join(str(int(x)) for x in src[i, : sl[i]]) for i in range(corpus.n)) + "\n"
    )
    (ref / "concept_labels.txt").write_text(
        "\n".join(" ".join(str(int(x)) for x in trg[i, : tl[i]]) for i in range(corpus.n)) + "\n"
    )
    # the "reference's" alignment dump = a converged aligner's output
    p = hmm.init(corpus)
    p, _ = jax.jit(lambda q: hmm.train(q, corpus, 20))(p)
    al = np.asarray(hmm.align(p, corpus))
    if fmt == "records":
        recs = [
            {"index": i, "alignment": [int(a) for a in al[i, : sl[i]]]}
            for i in range(corpus.n)
        ]
        (ref / "alignment_dump.json").write_text(json.dumps(recs))
    elif fmt == "bare":
        (ref / "alignments.json").write_text(
            json.dumps([[int(a) for a in al[i, : sl[i]]] for i in range(corpus.n)])
        )
    elif fmt == "dict":
        (ref / "alignment_out.json").write_text(
            json.dumps({"alignments": [[int(a) for a in al[i, : sl[i]]]
                                       for i in range(corpus.n)]})
        )
    return ref


@pytest.mark.parametrize("fmt", ["records", "bare", "dict"])
def test_parity_on_mocked_reference(tmp_path, fmt):
    ref = _mock_reference(tmp_path, fmt)
    report = rp.run_parity(ref, tmp_path / "wd", "hmm", 20, threshold=0.9)
    assert report["status"] == "parity", report
    assert report["best_f1"] >= 0.9
    assert report["corpus"]["n"] == 30


def test_parity_detects_divergence(tmp_path):
    ref = _mock_reference(tmp_path, "records")
    # corrupt the dump: shift all alignments by one target position
    dump = ref / "alignment_dump.json"
    recs = json.loads(dump.read_text())
    for rec in recs:
        rec["alignment"] = [(a % 4) + 1 for a in rec["alignment"]]
    dump.write_text(json.dumps(recs))
    report = rp.run_parity(ref, tmp_path / "wd", "hmm", 20, threshold=0.9)
    assert report["status"] == "diverged", report


def test_parity_empty_reference_reports_cleanly(tmp_path, capsys):
    empty = tmp_path / "empty"
    empty.mkdir()
    argv = sys.argv
    sys.argv = ["reference_parity.py", "--reference", str(empty)]
    try:
        rp.main()
    finally:
        sys.argv = argv
    out = json.loads(capsys.readouterr().out)
    assert out["status"] == "reference-mount-empty"


def test_alignment_dump_reader_jsonl(tmp_path):
    p = tmp_path / "a.json"
    p.write_text('{"index": 1, "alignment": [2, 0]}\n{"index": 0, "alignment": [1]}\n')
    out = rp.read_alignment_dump(p)
    assert out == [[1], [2, 0]]  # sorted by index
