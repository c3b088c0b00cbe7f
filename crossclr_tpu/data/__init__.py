"""Datasets and batching."""

from .datasets import (
    FeaturePairDataset,
    HostShard,
    RowSubset,
    SyntheticPairs,
    dataset_from_config,
    epoch_batches,
    infinite_batches,
    prefetch_to_device,
    stack_batches,
    stacked_chunks,
    train_eval_split,
)

__all__ = [
    "FeaturePairDataset",
    "HostShard",
    "RowSubset",
    "SyntheticPairs",
    "dataset_from_config",
    "epoch_batches",
    "infinite_batches",
    "prefetch_to_device",
    "stack_batches",
    "stacked_chunks",
    "train_eval_split",
]
