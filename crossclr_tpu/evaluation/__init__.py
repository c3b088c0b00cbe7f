"""Retrieval evaluation."""

from .retrieval import rank_of_ground_truth, retrieval_metrics, similarity_matrix

__all__ = ["rank_of_ground_truth", "retrieval_metrics", "similarity_matrix"]
