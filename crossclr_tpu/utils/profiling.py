"""Profiling / tracing hooks (SURVEY.md §5).

Thin wrappers over ``jax.profiler`` so training code can request a device
trace without importing profiler plumbing, plus a NaN-guard context that
flips on ``jax_debug_nans`` (the JAX equivalent of a sanitizer pass).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax

__all__ = ["trace", "nan_debug", "checked", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str | Path):
    """Capture a device trace viewable in TensorBoard / XProf."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug(enabled: bool = True):
    """Enable jax_debug_nans within the scope (catches NaNs at the op that
    produced them instead of at loss.item() time)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn, *, errors=None):
    """Wrap ``fn`` with ``jax.experimental.checkify`` so NaN/Inf and
    out-of-bounds indexing inside jitted code raise host-side errors with
    location info instead of propagating silently (SURVEY.md §5: the JAX
    equivalent of a sanitizer pass for kernel bounds).

    Returns a callable with the same signature; call ``.throw()`` semantics
    are handled internally — it raises on error, returns fn's outputs
    otherwise.  Debug tool: adds checking overhead, don't ship in the hot
    loop.
    """
    from jax.experimental import checkify as _checkify

    if errors is None:
        errors = _checkify.float_checks | _checkify.index_checks

    checked_fn = _checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        _checkify.check_error(err)
        return out

    return wrapper


class StepTimer:
    """Wall-clock steps/sec and pairs/sec tracker (host side)."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._steps / dt if dt > 0 else 0.0

    @property
    def pairs_per_sec(self) -> float:
        return self.steps_per_sec * self.batch_size
