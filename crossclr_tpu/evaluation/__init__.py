"""Retrieval evaluation and serving."""

from .retrieval import (
    QuantizedCorpus,
    encode_corpus,
    quantize_corpus,
    rank_of_ground_truth,
    retrieval_metrics,
    retrieve_topk,
    shard_corpus,
    sharded_retrieve_topk,
    similarity_matrix,
)

__all__ = [
    "QuantizedCorpus",
    "encode_corpus",
    "quantize_corpus",
    "rank_of_ground_truth",
    "retrieval_metrics",
    "retrieve_topk",
    "shard_corpus",
    "sharded_retrieve_topk",
    "similarity_matrix",
]
