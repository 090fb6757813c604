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
    """Append-only JSONL metrics log, with optional TensorBoard scalars.

    ``tensorboard_dir``: when set (CLI: ``train.tensorboard=true`` writes to
    ``<workdir>/tb``), every scalar metric is also emitted as a TensorBoard
    scalar via torch's SummaryWriter (SURVEY.md §5.5 "optional TensorBoard
    scalars"; tensorboard ships in this env, TF does not).  JSONL stays the
    source of truth — the evaluator and bench harness read it.
    """

    def __init__(self, path: str | Path, tensorboard_dir: str | Path | None = None):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._tb = None
        if tensorboard_dir is not None:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(tensorboard_dir))

    def write(self, step: int, **metrics: Any) -> None:
        rec = {"step": step, "time": time.time(), **_to_jsonable(metrics)}
        with self.path.open("a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k not in ("step", "time") and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()

    def read_all(self) -> list[dict]:
        if not self.path.exists():
            return []
        with self.path.open() as f:
            return [json.loads(line) for line in f if line.strip()]
