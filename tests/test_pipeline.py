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
