"""Reproduce the BASELINE.md variant-ordering table on one command.

Trains identical dual towers under every loss variant on the
planted-duplicate clustered benchmark (the behavioral anchor for the
paper's headline claim — full CrossCLR > onlyIntraModality > InfoNCE on
retrieval; see tests/test_variant_ordering.py and BASELINE.md
"Variant-ordering anchor") plus the ablation rows (no pruning, paper
weight temperature), and prints the metric table.

Run on the CPU backend (the shapes are tiny):
    python scripts/bench_accuracy.py [--seeds 5 0 1 2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[5],
                    help="data/init seeds (the pinned test seed is 5)")
    args = ap.parse_args(argv)

    from test_pruning_behavior import _make_planted_data
    from test_variant_ordering import _clean_r1, _probe_metrics, _train

    rows = {
        "info_nce": dict(loss="info_nce"),
        "crossclr_intra (released, w=0.8)": dict(loss="crossclr_intra"),
        "crossclr_intra (w=1.0 ablation)": dict(
            loss="crossclr_intra", negative_weight=1.0
        ),
        "crossclr (full: prune=0.25, flat τ_w)": dict(
            loss="crossclr", prune_percent=0.25, weight_temperature=1.0
        ),
        "crossclr (no pruning ablation)": dict(
            loss="crossclr", prune_percent=0.0, weight_temperature=1.0
        ),
        "crossclr (paper τ_w=0.0035: degenerate on synthetic scales)": dict(
            loss="crossclr", prune_percent=0.25, weight_temperature=0.0035
        ),
    }

    for seed in args.seeds:
        data = _make_planted_data(np.random.default_rng(seed))
        print(f"\nseed {seed}  (probe alignment | cluster R@1 vs "
              "distractors | clean exact R@1 guard)")
        for name, kwargs in rows.items():
            trainer, state = _train(data, kwargs)
            align, acc = _probe_metrics(trainer, state, data)
            clean = _clean_r1(trainer, state, data_seed=seed)
            print(f"  {name:58s} {align:6.3f} | {acc:4.2f} | {clean:5.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
