"""Orbax checkpointing.

The reference saves model state as NumPy arrays / JSON text via
``printModel``-style methods and resumes by hand (SURVEY.md §5.3/§5.4).  Here
every EM iteration / training step can checkpoint the full params pytree plus
the step counter, making runs exactly resumable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax for (params, step) pytrees."""

    def __init__(self, directory: str | Path, max_to_keep: int = 3):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, params: Any, extra: dict | None = None) -> None:
        state = {"params": params}
        if extra:
            state["extra"] = extra
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, params_template: Any, step: int | None = None) -> tuple[Any, int]:
        """Restore (params, step); template provides structure/dtypes."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        restored = self._mgr.restore(
            step,
            args=ocp.args.StandardRestore({"params": params_template}),
        )
        return restored["params"], step

    def close(self) -> None:
        self._mgr.close()
