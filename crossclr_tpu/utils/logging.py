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
    """Echoes metrics to stderr and appends them to a CSV.

    Different call sites log different key sets (train metrics vs eval
    retrieval metrics); the CSV schema is the union of all keys seen, and
    the file is rewritten when new keys appear so no column is silently
    dropped.  Rows are buffered in memory (metrics are tiny scalars).
    """

    def __init__(self, path: str | Path | None = None, *, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        self._rows: list[dict] = []
        self._fieldnames: list[str] = []

    def __call__(self, metrics: dict) -> None:
        if self.echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(parts, file=sys.stderr)
        if self.path is None:
            return
        self._rows.append(dict(metrics))
        new_keys = [k for k in metrics if k not in self._fieldnames]
        if new_keys:
            self._fieldnames.extend(new_keys)
        self._flush()

    def _flush(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=self._fieldnames)
            writer.writeheader()
            for row in self._rows:
                writer.writerow({k: row.get(k) for k in self._fieldnames})

    def close(self) -> None:
        if self.path is not None and self._rows:
            self._flush()
