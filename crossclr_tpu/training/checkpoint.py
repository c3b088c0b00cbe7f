"""Orbax checkpointing of params / optimizer state / data-iterator step.

The reference has no checkpointing (SURVEY.md §5); its only state is the
vestigial ``logit_scale`` (loss.py:52).  Here the full ``TrainState``
(towers + logit_scale + optimizer moments + step) is saved asynchronously
and restores bit-exact; deterministic data order (data.epoch_batches) plus
the restored step is the failure-recovery story.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper over ``orbax.checkpoint.CheckpointManager``.

    ``best_metric`` / ``best_mode``: retain checkpoints ranked by a saved
    metric instead of by recency — pass ``metrics=`` to :meth:`save`.
    Keep best-ranked retention in a SEPARATE directory from the resume
    checkpoints (the train CLI uses ``<dir>/best``): ranked garbage
    collection may delete the latest step, which would break
    resume-from-latest if mixed into the main directory.
    """

    def __init__(self, directory: str | Path, *, max_to_keep: int = 3,
                 best_metric: str | None = None, best_mode: str = "max"):
        opts: dict[str, Any] = dict(max_to_keep=max_to_keep, create=True)
        if best_metric is not None:
            opts.update(
                best_fn=lambda m: m[best_metric], best_mode=best_mode
            )
        self._mngr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(**opts),
        )

    def save(self, step: int, state: Any, *, wait: bool = False,
             metrics: dict | None = None) -> None:
        self._mngr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics
        )
        if wait:
            self._mngr.wait_until_finished()

    def best_step(self) -> int | None:
        """Step of the best saved checkpoint (needs ``best_metric``)."""
        return self._mngr.best_step()

    def restore(self, state_template: Any, step: int | None = None) -> Any:
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template)
        )

    def latest_step(self) -> int | None:
        return self._mngr.latest_step()

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def close(self) -> None:
        self._mngr.close()
