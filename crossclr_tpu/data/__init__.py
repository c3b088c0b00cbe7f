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
from .quantize import dequantize_batch, quantize_features

__all__ = [
    "FeaturePairDataset",
    "HostShard",
    "RowSubset",
    "SyntheticPairs",
    "dataset_from_config",
    "dequantize_batch",
    "epoch_batches",
    "infinite_batches",
    "prefetch_to_device",
    "quantize_features",
    "stack_batches",
    "stacked_chunks",
    "train_eval_split",
]
