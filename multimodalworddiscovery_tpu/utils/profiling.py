"""Tracing / profiling harness (SURVEY.md §5.1).

The reference has no profiling beyond wall-clock prints; here:
  - ``trace(dir)``: jax.profiler context manager -> Perfetto/TensorBoard trace
  - ``timeit``: block_until_ready timing helper used by bench.py and the
    kernel benchmarks.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a device trace viewable in Perfetto / TensorBoard."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, reps: int = 10, warmup: int = 1, **kwargs) -> tuple[float, object]:
    """Median-free mean seconds per call with compile excluded."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out
