"""Datasets and batching."""

from .datasets import (
    FeaturePairDataset,
    SyntheticPairs,
    epoch_batches,
    infinite_batches,
    prefetch_to_device,
)

__all__ = [
    "FeaturePairDataset",
    "SyntheticPairs",
    "epoch_batches",
    "infinite_batches",
    "prefetch_to_device",
]
