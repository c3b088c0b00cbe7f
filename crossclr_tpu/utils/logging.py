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
    """Echoes metrics to stderr, appends them to a CSV, and (optionally)
    streams scalars to TensorBoard (SURVEY.md §5: "CSV/TensorBoard").

    Different call sites log different key sets (train metrics vs eval
    retrieval metrics); the CSV schema is the union of all keys seen.
    Rows are normally APPENDED (one flushed write per call — crash leaves
    a valid prefix); only when new keys appear is the file rewritten with
    the widened header.  Rows are also kept in memory to make those rare
    rewrites possible (metrics are tiny scalars).
    """

    def __init__(
        self,
        path: str | Path | None = None,
        *,
        echo: bool = True,
        tensorboard_dir: str | Path | None = None,
    ):
        self.path = Path(path) if path else None
        self.echo = echo
        self._rows: list[dict] = []
        self._fieldnames: list[str] = []
        self._fh = None
        self._tb = None
        if tensorboard_dir is not None:
            # optional dependency: tensorboardX ships in this image, but
            # the writer must stay usable without it
            try:
                from tensorboardX import SummaryWriter
            except ImportError as e:
                raise RuntimeError(
                    "tensorboard_dir was requested but tensorboardX is "
                    "not installed"
                ) from e
            self._tb = SummaryWriter(str(tensorboard_dir))
        if self.path is not None and self.path.exists():
            # resume-from-checkpoint reuses the same --metrics-csv path:
            # load the existing header/rows so the log extends instead of
            # truncating pre-resume history (a crash leaves a valid prefix,
            # so this parse is safe)
            with open(self.path, newline="") as fh:
                reader = csv.DictReader(fh)
                if reader.fieldnames:
                    self._fieldnames = list(reader.fieldnames)
                    self._rows = [dict(row) for row in reader]

    def __call__(self, metrics: dict) -> None:
        if self.echo:
            parts = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(parts, file=sys.stderr)
        if self._tb is not None:
            import numbers

            step = int(metrics.get("step", len(self._rows)))
            for k, v in metrics.items():
                # numbers.Real also admits numpy/jnp host scalars, which
                # a bare isinstance(v, (int, float)) would silently drop
                # (np.float32 is not a Python float subclass)
                if k != "step" and isinstance(v, numbers.Real):
                    self._tb.add_scalar(k, float(v), step)
            self._tb.flush()
        if self.path is None:
            return
        row = dict(metrics)
        self._rows.append(row)
        new_keys = [k for k in row if k not in self._fieldnames]
        if new_keys:
            self._fieldnames.extend(new_keys)
            self._rewrite()
        else:
            self._append(row)

    def _rewrite(self) -> None:
        if self._fh is not None:
            self._fh.close()
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=self._fieldnames)
            w.writeheader()
            for row in self._rows:
                w.writerow({k: row.get(k) for k in self._fieldnames})
        self._fh = open(self.path, "a", newline="")
        self._append_writer = csv.DictWriter(
            self._fh, fieldnames=self._fieldnames
        )

    def _append(self, row: dict) -> None:
        if self._fh is None:
            self._rewrite()
            return
        self._append_writer.writerow(
            {k: row.get(k) for k in self._fieldnames}
        )
        self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
