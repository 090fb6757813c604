"""End-to-end pipeline smoke test: raw audio -> Pallas MFCC -> Gaussian HMM
-> segmentation -> metrics (BASELINE.json config #4)."""

import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_run_pipeline_end_to_end():
    out = subprocess.run(
        [sys.executable, "scripts/run_pipeline.py", "--utterances", "40",
         "--iters", "8", "--cpu", "--interpret"],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pipeline metrics" in out.stdout
    import json
    metrics = json.loads(out.stdout[out.stdout.index("{"):])
    assert metrics["alignment"]["f1"] > 0.35, metrics
    assert metrics["boundary"]["f1"] > 0.4, metrics


def test_run_pipeline_fullscale_scaled_down(tmp_path):
    """The reference-corpus-scale driver (round-4 VERDICT task 2), scaled
    down: batched synth -> on-device waveform assembly -> Pallas MFCC ->
    ShardWriter -> streamed EM -> streamed align/segment/evaluate, plus the
    built-in resident/streamed cross-check (the script aborts if shard-0
    metrics disagree beyond 1e-5).  Runs with --storage-dtype float16 so CI
    covers the compact-storage path end to end (write -> device upcast ->
    EM -> decode -> metrics -> resident cross-check)."""
    out = subprocess.run(
        [sys.executable, "scripts/run_pipeline_fullscale.py",
         "--utterances", "256", "--shard-size", "64", "--mfcc-batch", "64",
         "--iters", "3", "--retrieval-pool", "16", "--cpu", "--interpret",
         "--storage-dtype", "float16",
         "--workdir", str(tmp_path / "wd"),
         "--report", str(tmp_path / "report.json")],
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    import json
    report = json.loads((tmp_path / "report.json").read_text())
    assert report["crosscheck"]["max_abs_delta"] <= 1e-5
    assert report["metrics"]["alignment"]["f1"] > 0.3, report["metrics"]
    assert {s["stage"] for s in report["stages"]} >= {
        "synthesize+mfcc+shard", "streamed EM", "streamed align",
        "streamed segment", "streamed evaluate",
    }
    assert report["synthesize"]["shards"] == 4
