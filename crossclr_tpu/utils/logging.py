"""Metrics logging: CSV writer + stdout, usable as Trainer's ``writer``.

The reference accepts a ``logger`` kwarg it never uses (loss.py:50,55);
this is the working observability layer (SURVEY.md §5): scalar metrics out
of the jitted step, written host-side without blocking device execution.
"""

from __future__ import annotations

import csv
import sys
from pathlib import Path

__all__ = ["MetricsWriter"]


class MetricsWriter:
    def __init__(self, path: str | Path | None = None, *, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        self._fieldnames: list[str] | None = None
        self._fh = None

    def __call__(self, metrics: dict) -> None:
        if self.echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(parts, file=sys.stderr)
        if self.path is None:
            return
        if self._fh is None:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._fh = open(self.path, "w", newline="")
            self._fieldnames = list(metrics)
            self._writer = csv.DictWriter(self._fh, fieldnames=self._fieldnames)
            self._writer.writeheader()
        self._writer.writerow({k: metrics.get(k) for k in self._fieldnames})
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
