"""scripts/extract_features.py — the speech feature-extraction driver.

Batched extraction (--batch-size, bounds device memory) must produce
byte-identical features to the single-dispatch path.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).parent.parent
SCRIPT = REPO / "scripts" / "extract_features.py"


def _run(args):
    env = {**os.environ,
           "PYTHONPATH": f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
           "JAX_PLATFORMS": "cpu"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, str(SCRIPT), *args],
        capture_output=True, text=True, cwd=str(REPO), env=env, timeout=600,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    return r.stdout


def test_speech_batched_matches_unbatched(tmp_path):
    rng = np.random.default_rng(0)
    wavs = {f"arr_{i}": (0.1 * rng.normal(size=(3200 + 320 * i,))).astype(np.float32)
            for i in range(7)}
    src = tmp_path / "wavs.npz"
    np.savez(src, **wavs)

    out_a, out_b = tmp_path / "a.npz", tmp_path / "b.npz"
    _run(["speech", "--input", str(src), "--output", str(out_a), "--deltas", "--interpret"])
    stdout = _run(["speech", "--input", str(src), "--output", str(out_b),
                   "--deltas", "--interpret", "--batch-size", "3"])
    assert "3 batches of 3" in stdout

    with np.load(out_a) as za, np.load(out_b) as zb:
        assert sorted(za.files) == sorted(zb.files)
        for k in za.files:
            np.testing.assert_array_equal(za[k], zb[k])
