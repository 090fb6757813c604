"""JSONL metrics writer — the reference just print()s log-likelihoods
(SURVEY.md §5.5); here every run appends structured records for the evaluator
and the bench harness."""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import numpy as np


def _to_jsonable(v: Any) -> Any:
    if isinstance(v, (np.generic,)):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if hasattr(v, "item") and getattr(v, "ndim", None) == 0:  # jax scalar
        return v.item()
    if isinstance(v, dict):
        return {k: _to_jsonable(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_to_jsonable(x) for x in v]
    return v


class MetricsWriter:
    """Append-only JSONL metrics log."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def write(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time(), **_to_jsonable(metrics)}
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    def read_all(self) -> list[dict]:
        if not self.path.exists():
            return []
        with self.path.open() as f:
            return [json.loads(line) for line in f if line.strip()]
