"""Doc-truth checker: every performance number quoted in README.md must be
traceable to a measurement artifact (BENCH_r*.json, bench/results.jsonl, or
the authoritative tables in docs/PERFORMANCE.md).

Round-4 verdict (weak #2): quoted numbers drifted from artifacts in three
places across two rounds ("each is trivial; together they erode trust in the
numbers, which are this repo's whole argument").  This script makes the drift
mechanical to catch: run it after editing README/PERFORMANCE or after a bench
refresh.  It is also run in the fast test tier (tests/test_doc_numbers.py).

Each check = (claim, number parsed from a doc via regex, provenance value,
relative tolerance).  Tolerance covers quote-level rounding only — a real
re-measurement that moves a number must update the doc, not the tolerance.

Exit 0 = all claims verified; exit 1 = prints every mismatch.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(relpath: str) -> str:
    with open(os.path.join(ROOT, relpath)) as f:
        return f.read()


def doc_num(text: str, pattern: str) -> float:
    """Extract the single capture group of `pattern` as a float.
    Commas are stripped; the pattern itself handles k/M suffixes by
    capturing the already-scaled digits."""
    m = re.search(pattern, text)
    if m is None:
        raise AssertionError(f"doc pattern not found: {pattern!r}")
    return float(m.group(1).replace(",", ""))


def latest_bench() -> dict:
    paths = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
    if not paths:
        raise AssertionError("no BENCH_r*.json artifact")
    with open(paths[-1]) as f:
        return json.load(f)["parsed"]


def jsonl_last(kernel: str, **filters) -> dict:
    rows = []
    with open(os.path.join(ROOT, "bench", "results.jsonl")) as f:
        for line in f:
            r = json.loads(line)
            if r.get("kernel") == kernel and all(
                r.get(k) == v for k, v in filters.items()
            ):
                rows.append(r)
    if not rows:
        raise AssertionError(f"no results.jsonl row: {kernel} {filters}")
    return rows[-1]


def main() -> int:
    readme = _read("README.md")
    perf = _read("docs/PERFORMANCE.md")
    bench = latest_bench()
    failures: list[str] = []

    def check(claim, got, want, rtol=0.03):
        if want == 0:
            ok = got == 0
        else:
            ok = abs(got - want) / abs(want) <= rtol
        if not ok:
            failures.append(
                f"  {claim}: doc says {got}, artifact says {want} "
                f"(rel err {abs(got - want) / max(abs(want), 1e-12):.1%} "
                f"> rtol {rtol:.1%})"
            )

    # --- headline row <-> latest driver BENCH artifact ---
    check(
        "README headline utt·iter/s",
        doc_num(readme, r"\*\*([\d,]+),000 utt·iter/s\*\*") * 1e3,
        bench["value"],
        rtol=0.01,
    )
    check(
        "README headline speedup",
        doc_num(readme, r"\*\*~([\d,]+)×\*\*") * 1.0,
        bench["vs_baseline"],
        rtol=0.01,
    )

    # --- gradient-family rows <-> results.jsonl (same rows feed the
    # PERFORMANCE.md gradient table; checked both directions below) ---
    att = jsonl_last("attention_minibatch_step", batch=512)
    check("README attention ms/step",
          doc_num(readme, r"([\d.]+) ms/step \((\d+) steps/s, 105 k"),
          att["ms_per_step"])
    check("README attention steps/s",
          doc_num(readme, r"[\d.]+ ms/step \((\d+) steps/s, 105 k"),
          att["steps_per_sec"])
    check("README attention utt/s",
          doc_num(readme, r"steps/s, (\d+) k utt/s") * 1e3,
          att["utt_per_sec"])
    grd = jsonl_last("grounding_minibatch_step", batch=256)
    check("README grounding ms/step",
          doc_num(readme, r"([\d.]+) ms/step \(\d+ steps/s; 6\.2%"),
          grd["ms_per_step"])
    check("README grounding steps/s",
          doc_num(readme, r"[\d.]+ ms/step \((\d+) steps/s; 6\.2%"),
          grd["steps_per_sec"])
    for label, row, perf_pat in [
        ("attention", att,
         r"attention minibatch \(B=512, dim=128\) \| ([\d.]+) \| (\d+)"),
        ("grounding", grd,
         r"grounding minibatch \(B=256, dim=128\) \| ([\d.]+) \| (\d+)"),
    ]:
        m = re.search(perf_pat, perf)
        if m is None:
            failures.append(f"  PERFORMANCE gradient row missing: {label}")
        else:
            check(f"PERFORMANCE {label} ms/step", float(m.group(1)),
                  row["ms_per_step"])
            check(f"PERFORMANCE {label} steps/s", float(m.group(2)),
                  row["steps_per_sec"])

    # --- segmental k-means <-> results.jsonl ---
    sk = jsonl_last("segkmeans_em")
    check("README segkmeans ms/iter",
          doc_num(readme, r"([\d.]+) ms/iter \(\d+ k utt·iter/s, one-hot"),
          sk["ms_per_iter"])
    check("README segkmeans utt·iter/s",
          doc_num(readme, r"[\d.]+ ms/iter \((\d+) k utt·iter/s") * 1e3,
          sk["utt_iter_per_sec"])
    check("README segkmeans discover segments/s",
          doc_num(readme, r"discover at (\d+) k segments/s") * 1e3,
          jsonl_last("segkmeans_discover")["segments_per_sec"])

    # --- MFCC frontend <-> results.jsonl ---
    mf = jsonl_last("mfcc_pallas")
    check("README MFCC audio-sec/s",
          doc_num(readme, r"([\d,]+) audio-sec/s"),
          mf["audio_sec_per_sec"])
    check("README MFCC ms",
          doc_num(readme, r"\(([\d.]+) ms / 64×3 s\)"), mf["ms"])

    # --- Viterbi <-> results.jsonl (S=12 headline shape) ---
    vit = jsonl_last("viterbi_pallas", S=12)
    check("README viterbi ms",
          doc_num(readme, r"Viterbi decode[^|]*\| — \| ([\d.]+) ms"),
          vit["ms"])
    check("README viterbi utt/s",
          doc_num(readme, r"Viterbi decode[^|]*\| — \| [\d.]+ ms \((\d+) k")
          * 1e3,
          vit["utt_per_sec"])

    # --- model1: README <-> PERFORMANCE.md (authoritative; the jsonl row
    # predates the sufficient-statistics collapse) ---
    check("README model1 utt·iter/s vs PERFORMANCE",
          doc_num(readme, r"\*\*([\d,]+) utt·iter/s\*\* \(sufficient"),
          doc_num(perf, r"\(([\d.]+) M utt·iter/s\)\*\*") * 1e6,
          rtol=0.02)
    check("README/PERFORMANCE model1 ms (0.24)",
          doc_num(perf, r"Measured 0\.53 → \*\*([\d.]+) ms/EM-iter"),
          0.24, rtol=0.0)

    # --- fused-EM ms/iter quoted in the headline row parenthetical ---
    check("README headline ms/iter vs results.jsonl hmm_em_fused",
          doc_num(readme, r"Pallas EM pipeline; ([\d.]+) ms/iter"),
          jsonl_last("hmm_em_fused")["ms_per_iter"], rtol=0.05)

    # --- full-scale end-to-end run <-> bench/fullscale_n131072_report.json ---
    with open(os.path.join(ROOT, "bench", "fullscale_n131072_report.json")) as f:
        fs = json.load(f)
    fs_total = sum(s["seconds"] for s in fs["stages"])
    fs_rss = max(s["rss_gb"] for s in fs["stages"])
    check("README fullscale elapsed minutes",
          doc_num(readme, r"\(([\d.]+) min elapsed\)") * 60,
          fs["total_seconds"], rtol=0.01)
    check("README fullscale total seconds",
          doc_num(readme, r"\*\*(\d+) s of measured stages"),
          fs_total, rtol=0.01)
    check("README fullscale peak RSS",
          doc_num(readme, r"host RSS ≤ ([\d.]+) GB"), fs_rss, rtol=0.01)
    check("README fullscale F1",
          doc_num(readme, r"alignment F1 (0\.\d+) \(flat-start"),
          fs["metrics"]["alignment"]["f1"], rtol=0.01)
    check("PERFORMANCE fullscale total",
          doc_num(perf, r"\*\*TOTAL \(measured stages\)\*\* \| "
                        r"\*\*(\d+) s \(20\.4 min\)\*\*"),
          fs_total, rtol=0.01)
    check("PERFORMANCE fullscale F1",
          doc_num(perf, r"alignment F1 \*\*(0\.\d+)\*\* \(precision"),
          fs["metrics"]["alignment"]["f1"], rtol=0.01)
    for st in fs["stages"]:
        if st["stage"].startswith("streamed EM"):
            check("PERFORMANCE fullscale EM stage seconds",
                  doc_num(perf, r"vq_teacher \+ anneal, 12 iters\) "
                                r"\| ([\d.]+) s"),
                  st["seconds"], rtol=0.01)

    # --- ROADMAP must not contradict PERFORMANCE on model1 ---
    roadmap = _read("docs/ROADMAP.md")
    if "0.53 ms/iter" in roadmap:
        failures.append("  ROADMAP still quotes model1 at 0.53 ms/iter "
                        "(authoritative: 0.24, PERFORMANCE.md)")

    if failures:
        print("doc-number check FAILED:")
        print("\n".join(failures))
        return 1
    print("doc-number check OK (all quoted numbers match artifacts)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
