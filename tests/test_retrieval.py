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


def test_retrieve_topk_exact():
    rng = np.random.default_rng(3)
    corpus = jnp.asarray(rng.standard_normal((200, 16)), jnp.float32)
    queries = corpus[np.asarray([5, 17, 123])]  # exact matches exist
    from crossclr_tpu.evaluation import retrieve_topk

    scores, idx = retrieve_topk(queries, corpus, k=3)
    assert idx.shape == (3, 3) and scores.shape == (3, 3)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), [5, 17, 123])
    np.testing.assert_allclose(np.asarray(scores[:, 0]), 1.0, atol=1e-5)
    # scores sorted descending
    s = np.asarray(scores)
    assert np.all(s[:, :-1] >= s[:, 1:] - 1e-7)


def test_retrieve_topk_chunking_matches_unchunked():
    rng = np.random.default_rng(4)
    corpus = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    queries = jnp.asarray(rng.standard_normal((50, 8)), jnp.float32)
    from crossclr_tpu.evaluation import retrieve_topk

    s1, i1 = retrieve_topk(queries, corpus, k=5, query_chunk=16)  # pads 50->64
    s2, i2 = retrieve_topk(queries, corpus, k=5, query_chunk=50)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_encode_corpus_collects_batches():
    from crossclr_tpu.evaluation import encode_corpus

    def fake_encode(batch):
        v = jnp.asarray(batch["video"], jnp.float32) * 2.0
        t = jnp.asarray(batch["text"], jnp.float32) + 1.0
        return v, t

    batches = [
        {"video": np.full((4, 3), i, np.float32), "text": np.ones((4, 2), np.float32)}
        for i in range(3)
    ]
    v_out = encode_corpus(fake_encode, batches, side="video")
    t_out = encode_corpus(fake_encode, iter(batches), side="text")
    assert v_out.shape == (12, 3) and t_out.shape == (12, 2)
    np.testing.assert_array_equal(np.asarray(v_out[4:8]), np.full((4, 3), 2.0))
    np.testing.assert_array_equal(np.asarray(t_out), np.full((12, 2), 2.0))


def test_chunked_metrics_match_dense(rng):
    """query_chunk path == dense path exactly (same tie convention), for
    chunk sizes that do and don't divide N."""
    from crossclr_tpu.evaluation import retrieval_metrics

    v = jnp.asarray(rng.standard_normal((100, 16)), jnp.float32)
    t = jnp.asarray(0.5 * np.asarray(v[:, :16]) + rng.standard_normal((100, 16)).astype(np.float32))
    dense = retrieval_metrics(v, t)
    for chunk in (100, 32, 7):
        chunked = retrieval_metrics(v, t, query_chunk=chunk)
        assert set(chunked) == set(dense)
        for k in dense:
            np.testing.assert_allclose(chunked[k], dense[k], rtol=1e-6, err_msg=k)


# ---------------------------------------------------------------------------
# sharded corpus top-k (serving past one chip's HBM)
# ---------------------------------------------------------------------------


def _assert_topk_equivalent(q, c, k, got_s, got_i, want_s, want_i):
    """The sharded result must equal the dense one up to matmul
    reduction-order noise (CPU blocks the two shapes differently, so
    scores can differ in the last ulp and exact ties may swap): scores
    match positionally within fp32 noise, indices are a valid top-k
    selection under a float64 host reference, no duplicates."""
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    want_s, want_i = np.asarray(want_s), np.asarray(want_i)
    np.testing.assert_allclose(got_s, want_s, atol=2e-6, rtol=0)
    qn = np.asarray(q, np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    cn = np.asarray(c, np.float64)
    cn /= np.linalg.norm(cn, axis=1, keepdims=True)
    sim = qn @ cn.T
    for r in range(got_i.shape[0]):
        assert len(set(got_i[r].tolist())) == k, "duplicate index in top-k"
        sel = np.sort(sim[r, got_i[r]])[::-1]
        ref = np.sort(sim[r, want_i[r]])[::-1]
        np.testing.assert_allclose(sel, ref, atol=2e-6, rtol=0)
        # positional: returned scores really are these rows' similarities
        np.testing.assert_allclose(
            np.sort(got_s[r])[::-1], sel, atol=2e-6, rtol=0
        )


def _sharded_case(nc, k, nq=7, d=12, seed=0, ties=False):
    import jax

    from crossclr_tpu.evaluation import (
        retrieve_topk,
        shard_corpus,
        sharded_retrieve_topk,
    )
    from crossclr_tpu.parallel import make_mesh

    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((nq, d)), jnp.float32)
    c = rng.standard_normal((nc, d)).astype(np.float32)
    if ties:
        # plant exact duplicates so tie handling is exercised, within and
        # across shard boundaries
        c[nc // 2 :] = c[: nc - nc // 2]
    c = jnp.asarray(c)
    mesh = make_mesh()
    k_eff = min(k, nc)

    want_s, want_i = retrieve_topk(q, c, k=k)
    got_s, got_i = sharded_retrieve_topk(q, c, k=k, mesh=mesh)
    _assert_topk_equivalent(q, c, k_eff, got_s, got_i, want_s, want_i)

    # pre-sharded placement (the serving configuration): same result,
    # and the index really is row-sharded over the data axis
    placed = shard_corpus(c, mesh)
    n_dev = mesh.shape["data"]
    assert placed.shape[0] % n_dev == 0
    assert len(placed.sharding.device_set) == n_dev
    s2, i2 = sharded_retrieve_topk(q, placed, k=k, mesh=mesh, n_real=nc)
    _assert_topk_equivalent(q, c, k_eff, s2, i2, want_s, want_i)
    # padded rows must never surface, even with duplicates/ties around
    assert int(np.asarray(i2).max()) < nc
    jax.block_until_ready((got_s, s2))


def test_sharded_topk_matches_dense_divisible():
    _sharded_case(nc=64, k=5)


def test_sharded_topk_matches_dense_ragged_rows():
    # 53 rows over 8 devices: zero-padding path, padded rows masked out
    _sharded_case(nc=53, k=10, seed=1)


def test_sharded_topk_k_exceeds_per_shard_rows():
    # rows_per = 8 < k = 20: local cut is min(k, rows_per), merge is
    # still exact
    _sharded_case(nc=64, k=20, seed=2)


def test_sharded_topk_handles_exact_ties():
    _sharded_case(nc=48, k=12, seed=3, ties=True)


def test_sharded_topk_k_clamps_to_corpus():
    _sharded_case(nc=24, k=24, seed=4)


def _sharded_metrics_case(n, d=10, seed=0, query_chunk=16):
    from crossclr_tpu.evaluation import retrieval_metrics
    from crossclr_tpu.parallel import make_mesh

    rng = np.random.default_rng(seed)
    v = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    t = jnp.asarray(
        0.6 * np.asarray(v) + 0.8 * rng.standard_normal((n, d)), jnp.float32
    )
    mesh = make_mesh()
    dense = retrieval_metrics(v, t)
    chunked = retrieval_metrics(v, t, query_chunk=query_chunk)
    sharded = retrieval_metrics(v, t, query_chunk=query_chunk, mesh=mesh)
    assert sharded == chunked
    for key in dense:
        np.testing.assert_allclose(sharded[key], dense[key], rtol=1e-6)


def test_sharded_metrics_match_dense():
    # 64 rows over 8 devices: even shards
    _sharded_metrics_case(n=64)


def test_sharded_metrics_ragged_rows_and_chunk():
    # 53 rows: corpus shard padding AND query-chunk padding both active
    _sharded_metrics_case(n=53, seed=1, query_chunk=8)


def test_sharded_retrieval_fuzz():
    """Random (nc, k, nq, duplicate-fraction) grid: sharded top-k stays
    equivalent to dense and sharded metrics stay equal to chunked, across
    shard-padding, k-vs-rows-per-shard, and tie configurations."""
    from crossclr_tpu.evaluation import (
        retrieval_metrics,
        retrieve_topk,
        sharded_retrieve_topk,
    )
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(42)
    for trial in range(12):
        nc = int(rng.integers(9, 90))
        k = int(rng.integers(1, 25))
        nq = int(rng.integers(1, 9))
        d = int(rng.integers(4, 20))
        q = jnp.asarray(rng.standard_normal((nq, d)), jnp.float32)
        c = rng.standard_normal((nc, d)).astype(np.float32)
        if trial % 3 == 0 and nc >= 4:
            # plant duplicates (exact score ties)
            n_dup = nc // 4
            c[-n_dup:] = c[:n_dup]
        c = jnp.asarray(c)
        k_eff = min(k, nc)
        want = retrieve_topk(q, c, k=k)
        got = sharded_retrieve_topk(q, c, k=k, mesh=mesh)
        _assert_topk_equivalent(q, c, k_eff, got[0], got[1], want[0], want[1])
        # int8 index on the same trial grid: sharded == dense BITWISE
        from crossclr_tpu.evaluation import quantize_corpus

        qc = quantize_corpus(np.asarray(c))
        want_q = retrieve_topk(q, qc, k=k)
        got_q = sharded_retrieve_topk(q, qc, k=k, mesh=mesh)
        np.testing.assert_array_equal(
            np.asarray(got_q[1]), np.asarray(want_q[1])
        )
        np.testing.assert_array_equal(
            np.asarray(got_q[0]), np.asarray(want_q[0])
        )
        if trial % 4 == 0:
            v = jnp.asarray(rng.standard_normal((nc, d)), jnp.float32)
            t = jnp.asarray(
                0.5 * np.asarray(v)
                + rng.standard_normal((nc, d)).astype(np.float32)
            )
            chunk = int(rng.integers(2, nc + 1))
            assert retrieval_metrics(
                v, t, query_chunk=chunk, mesh=mesh
            ) == retrieval_metrics(v, t, query_chunk=chunk), (
                f"trial {trial}: nc={nc} chunk={chunk}"
            )


# ---------------------------------------------------------------------------
# int8 quantized corpus index


def test_quantize_corpus_reconstruction_bound():
    """Dequantized rows reproduce the NORMALIZED corpus within the
    symmetric-quantization bound (scale/2 per element, scale <= 1/127)."""
    from crossclr_tpu.evaluation import quantize_corpus
    from crossclr_tpu.losses.functional import l2_normalize

    rng = np.random.default_rng(0)
    c = rng.standard_normal((64, 24)).astype(np.float32)
    qc = quantize_corpus(c)
    assert qc.values.dtype == np.int8 and qc.scales.dtype == np.float32
    assert qc.values.shape == (64, 24) and qc.scales.shape == (64,)
    cn = np.asarray(l2_normalize(jnp.asarray(c), axis=1))
    recon = qc.values.astype(np.float32) * qc.scales[:, None]
    err = np.abs(recon - cn)
    assert np.all(err <= qc.scales[:, None] / 2 + 1e-7)
    # unit vectors: every row's max |component| maps to exactly +/-127
    assert np.all(np.max(np.abs(qc.values), axis=1) == 127)


def test_quantized_topk_matches_fp32():
    """int8 index vs fp32 index: identical top-1 on a separated corpus,
    scores within the quantization error bound (~1e-2 on cosine)."""
    from crossclr_tpu.evaluation import quantize_corpus, retrieve_topk

    rng = np.random.default_rng(3)
    corpus = jnp.asarray(rng.standard_normal((200, 32)), jnp.float32)
    queries = corpus[np.asarray([5, 17, 123, 77])]  # exact matches exist
    qc = quantize_corpus(corpus)

    s_f32, i_f32 = retrieve_topk(queries, corpus, k=5)
    s_q, i_q = retrieve_topk(queries, qc, k=5)
    # exact-match queries: quantization cannot displace the self column
    np.testing.assert_array_equal(np.asarray(i_q[:, 0]), [5, 17, 123, 77])
    np.testing.assert_allclose(np.asarray(s_q[:, 0]), 1.0, atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(s_q), np.asarray(s_f32), atol=2e-2
    )
    s = np.asarray(s_q)
    assert np.all(s[:, :-1] >= s[:, 1:] - 1e-7)  # sorted descending


def test_quantized_topk_chunking_matches_unchunked():
    from crossclr_tpu.evaluation import quantize_corpus, retrieve_topk

    rng = np.random.default_rng(4)
    qc = quantize_corpus(rng.standard_normal((64, 8)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((50, 8)), jnp.float32)
    s1, i1 = retrieve_topk(queries, qc, k=5, query_chunk=16)  # pads 50->64
    s2, i2 = retrieve_topk(queries, qc, k=5, query_chunk=50)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    # int8 x int8 -> int32 accumulation is exact: bitwise-equal scores
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sharded_quantized_matches_dense_quantized():
    """Sharded int8 search == dense int8 search BITWISE (integer
    accumulation has no reduction-order noise), across ragged shard
    padding, k > rows-per-shard, and planted exact duplicates."""
    import jax

    from crossclr_tpu.evaluation import (
        quantize_corpus,
        retrieve_topk,
        shard_corpus,
        sharded_retrieve_topk,
    )
    from crossclr_tpu.parallel import make_mesh

    mesh = make_mesh()
    rng = np.random.default_rng(7)
    for nc, k, ties in ((64, 5, False), (53, 10, False), (48, 20, True)):
        c = rng.standard_normal((nc, 16)).astype(np.float32)
        if ties:
            c[nc // 2 :] = c[: nc - nc // 2]  # duplicates across shards
        q = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
        qc = quantize_corpus(c)
        want_s, want_i = retrieve_topk(q, qc, k=k)
        got_s, got_i = sharded_retrieve_topk(q, qc, k=k, mesh=mesh)
        np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want_s))

        placed = shard_corpus(qc, mesh)
        n_dev = mesh.shape["data"]
        assert placed.values.shape[0] % n_dev == 0
        assert placed.values.dtype == jnp.int8
        assert len(placed.values.sharding.device_set) == n_dev
        assert placed.scales.shape[0] == placed.values.shape[0]
        s2, i2 = sharded_retrieve_topk(q, placed, k=k, mesh=mesh, n_real=nc)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(want_i))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(want_s))
        assert int(np.asarray(i2).max()) < nc  # padded rows never surface
        jax.block_until_ready((got_s, s2))


def test_quantized_zero_query_row_is_finite():
    """A zero query row hits the eps scale guard: scores stay finite."""
    from crossclr_tpu.evaluation import quantize_corpus, retrieve_topk

    rng = np.random.default_rng(9)
    qc = quantize_corpus(rng.standard_normal((16, 8)).astype(np.float32))
    q = np.zeros((2, 8), np.float32)
    q[1] = rng.standard_normal(8)
    s, i = retrieve_topk(jnp.asarray(q), qc, k=3)
    assert np.all(np.isfinite(np.asarray(s)))
    assert np.asarray(i).shape == (2, 3)
