"""Datasets and batching."""

from .datasets import (
    FeaturePairDataset,
    HostShard,
    SyntheticPairs,
    epoch_batches,
    infinite_batches,
    prefetch_to_device,
)

__all__ = [
    "FeaturePairDataset",
    "HostShard",
    "SyntheticPairs",
    "epoch_batches",
    "infinite_batches",
    "prefetch_to_device",
]
