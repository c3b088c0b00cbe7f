"""Datasets and batching."""

from .datasets import (
    FeaturePairDataset,
    SyntheticPairs,
    epoch_batches,
    infinite_batches,
)

__all__ = [
    "FeaturePairDataset",
    "SyntheticPairs",
    "epoch_batches",
    "infinite_batches",
]
