"""Retrieval metric tests."""

import jax.numpy as jnp
import numpy as np

from crossclr_tpu.evaluation import (
    rank_of_ground_truth,
    retrieval_metrics,
    similarity_matrix,
)


def test_perfect_alignment_gives_r1_100():
    emb = jnp.asarray(np.random.default_rng(0).standard_normal((32, 16)), jnp.float32)
    m = retrieval_metrics(emb, emb)
    assert m["v2t/R@1"] == 100.0
    assert m["t2v/R@1"] == 100.0
    assert m["v2t/MdR"] == 1.0


def test_reversed_alignment_gives_low_r1():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((64, 16)), jnp.float32)
    m = retrieval_metrics(v, v[::-1])
    assert m["v2t/R@1"] <= 10.0


def test_rank_extraction_known_case():
    # row 0: gt sim 0.9 is the best -> rank 0
    # row 1: gt sim 0.1, one larger (0.5) -> rank 1
    sim = jnp.asarray([[0.9, 0.2], [0.5, 0.1]])
    ranks = np.asarray(rank_of_ground_truth(sim))
    np.testing.assert_array_equal(ranks, [0, 1])


def test_metrics_monotone_in_k():
    rng = np.random.default_rng(1)
    v = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
    t = v + 0.5 * jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
    m = retrieval_metrics(v, t)
    assert m["v2t/R@1"] <= m["v2t/R@5"] <= m["v2t/R@10"] <= 100.0


def test_similarity_matrix_is_cosine():
    rng = np.random.default_rng(2)
    v = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    sim = np.asarray(similarity_matrix(v, v))
    np.testing.assert_allclose(np.diagonal(sim), 1.0, atol=1e-5)
    assert np.all(sim <= 1.0 + 1e-5) and np.all(sim >= -1.0 - 1e-5)
