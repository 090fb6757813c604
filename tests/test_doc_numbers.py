"""Doc-truth regression test: README/PERFORMANCE numbers must match the
measurement artifacts (round-4 verdict weak #2 — drift recurred twice).

Pure file parsing — no JAX, runs in the fast tier in milliseconds."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_doc_numbers_match_artifacts():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "check_doc_numbers.py")],
        capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
