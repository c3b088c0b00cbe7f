"""Video↔text retrieval metrics: R@K, Median Rank, Mean Rank.

The reference repo evaluates nothing (SURVEY.md §1: eval layer absent);
the paper reports YouCook2 / LSMDC retrieval R@1/5/10 and MdR
(README.md:7 → arXiv 2109.14910).  This module computes those metrics
under ``jit`` on device: a single similarity matmul plus rank extraction —
no host-side sorting of the full matrix.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..losses.functional import l2_normalize

__all__ = [
    "retrieval_metrics",
    "similarity_matrix",
    "rank_of_ground_truth",
    "retrieve_topk",
    "shard_corpus",
    "sharded_retrieve_topk",
    "encode_corpus",
    "QuantizedCorpus",
    "quantize_corpus",
]


class QuantizedCorpus(NamedTuple):
    """An int8-quantized retrieval index: 4× less HBM than fp32.

    ``values[i] * scales[i]`` reconstructs the L2-NORMALIZED corpus row i
    (symmetric per-row quantization, so no zero-points).  A NamedTuple is
    a pytree, so a ``QuantizedCorpus`` passes straight through ``jit`` /
    ``shard_map`` / ``device_put`` wherever a dense corpus array does.
    """

    values: jax.Array  # int8 [N, D]
    scales: jax.Array  # float32 [N]


def quantize_corpus(corpus_emb) -> QuantizedCorpus:
    """Quantize a corpus to int8 on the HOST (never commits the fp32
    matrix to a device — the point is indexes too big for that).

    Rows are L2-normalized first (cosine retrieval stores unit vectors),
    then symmetrically quantized per row: ``scale = max|row| / 127``,
    ``values = round(row / scale)``.  Worst-case per-element error is
    ``scale/2 ≤ 1/254`` of a unit vector — cosine scores move by ≲1e-2,
    which top-k ranking tolerates (tests pin top-1 agreement and score
    deltas).  Scoring happens in int8×int8→int32 on the MXU (2× the bf16
    rate) — see :func:`retrieve_topk`.
    """
    import numpy as np

    from ..data.quantize import symmetric_int8_rows

    arr = np.asarray(corpus_emb, np.float32)
    norms = np.linalg.norm(arr, axis=1, keepdims=True)
    arr = arr / np.maximum(norms, 1e-12)
    values, scales = symmetric_int8_rows(arr)
    return QuantizedCorpus(values, scales)


def _quantize_queries(q: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8 quantization of normalized queries, inside
    jit (queries are tiny; the corpus is what was quantized offline) —
    the traced twin of ``data.quantize.symmetric_int8_rows``."""
    from ..data.quantize import symmetric_int8_rows

    qn = l2_normalize(q.astype(jnp.float32), axis=1)
    return symmetric_int8_rows(qn, xp=jnp)


def _quantized_sim(
    q_values: jax.Array, q_scales: jax.Array, corpus: QuantizedCorpus
) -> jax.Array:
    """int8×int8→int32 dot on the MXU, rescaled to cosine similarity.

    Exact integer accumulation (D·127² ≪ 2³¹ for any realistic embed
    dim), so sharded and dense paths produce BITWISE-equal scores —
    unlike fp32 matmuls, where reduction order shifts the last ulp.
    """
    acc = jax.lax.dot_general(
        q_values,
        corpus.values,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * q_scales[:, None] * corpus.scales[None, :]


def _corpus_rows(corpus) -> int:
    c = corpus.values if isinstance(corpus, QuantizedCorpus) else corpus
    return int(c.shape[0])


def similarity_matrix(video_emb: jax.Array, text_emb: jax.Array) -> jax.Array:
    """Cosine similarity ``[Nv, Nt]`` between normalized embeddings."""
    v = l2_normalize(video_emb.astype(jnp.float32), axis=1)
    t = l2_normalize(text_emb.astype(jnp.float32), axis=1)
    return jnp.matmul(v, t.T, precision=jax.lax.Precision.HIGHEST)


def rank_of_ground_truth(sim: jax.Array) -> jax.Array:
    """0-based rank of the diagonal (ground-truth pair) per row.

    rank_i = #\\{j : sim[i, j] > sim[i, i]\\} — ties resolve in favor of the
    ground truth (standard retrieval convention, matches COOT's evaluator).
    Computed with a comparison + rowsum instead of a full argsort: O(N²)
    elementwise on the VPU, no sort network.
    """
    diag = jnp.diagonal(sim)[:, None]
    return jnp.sum(sim > diag, axis=1)


@functools.partial(jax.jit, static_argnames=("ks",))
def _metrics_from_sim(sim: jax.Array, ks: tuple[int, ...]) -> dict:
    def one_direction(s):
        ranks = rank_of_ground_truth(s)
        out = {f"R@{k}": jnp.mean((ranks < k).astype(jnp.float32)) * 100 for k in ks}
        out["MdR"] = jnp.median(ranks).astype(jnp.float32) + 1  # 1-based
        out["MnR"] = jnp.mean(ranks.astype(jnp.float32)) + 1
        return out

    v2t = one_direction(sim)
    t2v = one_direction(sim.T)
    out = {f"v2t/{k}": v for k, v in v2t.items()}
    out.update({f"t2v/{k}": v for k, v in t2v.items()})
    return out


# dense [N, N] similarity beyond this row count would not fit HBM
# comfortably; metrics switch to the query-chunked path automatically
_DENSE_SIM_MAX_ROWS = 16384


@functools.partial(jax.jit, static_argnames=("query_chunk",))
def _ranks_chunked(
    q_norm: jax.Array, c_norm: jax.Array, query_chunk: int
) -> jax.Array:
    """0-based ground-truth ranks (query i ↔ corpus row i) without ever
    materializing more than ``[query_chunk, N]`` similarities."""
    n = q_norm.shape[0]
    pad = (-n) % query_chunk
    q_padded = jnp.pad(q_norm, ((0, pad), (0, 0)))
    idx = jnp.pad(jnp.arange(n), (0, pad))
    blocks = q_padded.reshape(-1, query_chunk, q_norm.shape[1])
    idx_blocks = idx.reshape(-1, query_chunk)

    def one_block(args):
        qb, ib = args
        sim = jnp.matmul(qb, c_norm.T, precision=jax.lax.Precision.HIGHEST)
        truth = sim[jnp.arange(query_chunk), ib][:, None]
        return jnp.sum(sim > truth, axis=1)

    ranks = jax.lax.map(one_block, (blocks, idx_blocks))
    return ranks.reshape(-1)[:n]


def _metrics_from_ranks(ranks: jax.Array, ks: tuple[int, ...]) -> dict:
    out = {
        f"R@{k}": jnp.mean((ranks < k).astype(jnp.float32)) * 100 for k in ks
    }
    out["MdR"] = jnp.median(ranks).astype(jnp.float32) + 1  # 1-based
    out["MnR"] = jnp.mean(ranks.astype(jnp.float32)) + 1
    return out


# bounded: each entry retains a compiled shard_map executable; a
# long-running serve/eval process with changing row counts must not
# accumulate dead executables forever
@functools.lru_cache(maxsize=32)
def _sharded_ranks_fn(mesh, n_real: int, query_chunk: int):
    """Build (and cache) the jitted corpus-sharded rank computation.

    The rank decomposes over disjoint corpus shards: ``rank_i = Σ_j
    [sim_ij > truth_i]`` is a sum of per-shard partial counts, psum'd
    over the data axis.  Each device therefore only ever holds its
    ``[rows/n_dev, D]`` corpus shard and a ``[chunk, rows/n_dev]`` score
    block — the eval counterpart of :func:`sharded_retrieve_topk`.
    Queries are replicated; the ground-truth similarity ``truth_i =
    q_i·c_i`` is computed by the device owning corpus row i and
    all-gathered (O(N) comm, not O(N²)).
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    def local(q_norm, c_loc):
        rows_per = c_loc.shape[0]
        i = jax.lax.axis_index(DATA_AXIS)
        gidx = i * rows_per + jnp.arange(rows_per)

        pad = (-n_real) % query_chunk
        q_padded = jnp.pad(q_norm, ((0, pad), (0, 0)))
        # padded query rows get index −1: no corpus column matches, so
        # their truth is 0 and their (discarded) counts are harmless
        qidx = jnp.pad(jnp.arange(n_real), (0, pad), constant_values=-1)
        blocks = q_padded.reshape(-1, query_chunk, q_norm.shape[1])
        qidx_blocks = qidx.reshape(-1, query_chunk)

        def one_block(args):
            qb, qi = args
            sim = jnp.matmul(
                qb, c_loc.T, precision=jax.lax.Precision.HIGHEST
            )
            # the ground-truth similarity must be the SAME matmul value
            # the comparisons see — a separately-computed dot differs in
            # the last ulp and would make the self column count; extract
            # it from the owner's block and psum (one device contributes,
            # the rest add zeros)
            self_col = gidx[None, :] == qi[:, None]
            truth = jax.lax.psum(
                jnp.sum(jnp.where(self_col, sim, 0.0), axis=1), DATA_AXIS
            )
            # padded corpus rows (gidx >= n_real) never outrank anything;
            # the self column is excluded structurally, not by fp compare
            valid = (gidx < n_real)[None, :] & ~self_col
            return jnp.sum((sim > truth[:, None]) & valid, axis=1)

        partial = jax.lax.map(one_block, (blocks, qidx_blocks)).reshape(-1)
        return jax.lax.psum(partial[:n_real], DATA_AXIS)

    # check_vma=False: outputs are replicated (they come off a psum) but
    # the inference can't prove it through axis_index arithmetic — same
    # as _sharded_topk_fn above
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
    )


def retrieval_metrics(
    video_emb: jax.Array,
    text_emb: jax.Array,
    ks: tuple[int, ...] = (1, 5, 10),
    query_chunk: int | None = None,
    mesh=None,
) -> dict[str, float]:
    """Bidirectional retrieval metrics as host floats.

    ``video_emb`` / ``text_emb``: aligned ``[N, D]`` embeddings (row i of
    each is a ground-truth pair).  ``query_chunk``: process queries in
    blocks of this many rows so only ``[chunk, N]`` similarities live at a
    time — required for corpora where ``[N, N]`` exceeds device memory.
    Defaults to the dense one-matmul path for small N and auto-chunks
    beyond ``_DENSE_SIM_MAX_ROWS``; both paths are rank-identical (ties
    resolve in favor of the ground truth either way).

    ``mesh``: shard the CORPUS side of each direction's ranking over the
    mesh's data axis — per-device memory drops to ``[chunk, N/n_dev]``
    scores plus a ``[N/n_dev, D]`` corpus shard, so eval scales with the
    slice like :func:`sharded_retrieve_topk` does for serving.  Ranks are
    exact partial-count sums (psum), not approximations.
    """
    n = video_emb.shape[0]
    if query_chunk is None and (n > _DENSE_SIM_MAX_ROWS or mesh is not None):
        query_chunk = 4096
    if query_chunk is None:
        sim = similarity_matrix(video_emb, text_emb)
        return {k: float(v) for k, v in _metrics_from_sim(sim, ks).items()}

    v = l2_normalize(video_emb.astype(jnp.float32), axis=1)
    t = l2_normalize(text_emb.astype(jnp.float32), axis=1)
    chunk = min(query_chunk, n)
    out = {}
    for tag, q, c in (("v2t", v, t), ("t2v", t, v)):
        if mesh is None:
            ranks = _ranks_chunked(q, c, chunk)
        else:
            ranks = _sharded_ranks_fn(mesh, n, chunk)(q, shard_corpus(c, mesh))
        out.update(
            {f"{tag}/{k}": v_ for k, v_ in _metrics_from_ranks(ranks, ks).items()}
        )
    return {k: float(v) for k, v in out.items()}


@functools.partial(jax.jit, static_argnames=("k", "query_chunk"))
def retrieve_topk(
    query_emb: jax.Array,
    corpus_emb,
    *,
    k: int = 10,
    query_chunk: int = 1024,
) -> tuple[jax.Array, jax.Array]:
    """Serving path: top-k corpus indices/scores per query by cosine sim.

    Queries are processed in ``query_chunk`` blocks with ``lax.map`` so a
    large query set never materializes the full ``[Nq, Nc]`` similarity
    matrix — only ``[chunk, Nc]`` lives at a time, and ``lax.top_k`` runs
    on device.  Returns ``(scores [Nq, k], indices [Nq, k])``.

    ``corpus_emb`` may be a dense ``[N, D]`` array (fp32 HIGHEST matmul)
    or a :class:`QuantizedCorpus` (queries are quantized per-row inside
    the program and scored int8×int8→int32 on the MXU).
    """
    quantized = isinstance(corpus_emb, QuantizedCorpus)
    if quantized:
        q, q_scales = _quantize_queries(query_emb)
        c = corpus_emb
    else:
        q = l2_normalize(query_emb.astype(jnp.float32), axis=1)
        c = l2_normalize(corpus_emb.astype(jnp.float32), axis=1)
    nq = q.shape[0]
    k = min(k, _corpus_rows(corpus_emb))  # top-k cannot exceed the corpus
    if nq == 0:
        return (
            jnp.zeros((0, k), jnp.float32),
            jnp.zeros((0, k), jnp.int32),
        )
    chunk = min(query_chunk, nq)
    pad = (-nq) % chunk
    q_padded = jnp.pad(q, ((0, pad), (0, 0)))
    blocks = q_padded.reshape(-1, chunk, q.shape[1])
    if quantized:
        s_padded = jnp.pad(q_scales, (0, pad))
        blocks = (blocks, s_padded.reshape(-1, chunk))

    def one_block(args):
        if quantized:
            qb, sb = args
            sim = _quantized_sim(qb, sb, c)
        else:
            sim = jnp.matmul(args, c.T, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(sim, k)

    scores, idx = jax.lax.map(one_block, blocks)
    scores = scores.reshape(-1, k)[:nq]
    idx = idx.reshape(-1, k)[:nq]
    return scores, idx


def shard_corpus(corpus_emb, mesh) -> jax.Array:
    """Place a corpus row-sharded over the mesh's data axis.

    Rows are zero-padded to a multiple of the axis size so every device
    holds the same block shape (a jit/shard_map requirement); the padded
    rows are provably inert in :func:`sharded_retrieve_topk` (their
    global index ≥ the real row count masks their scores to −inf before
    any top-k sees them).  Per-device HBM holds ``rows/n_dev`` of the
    index — the point when one chip cannot hold the corpus.  Padding
    happens on the HOST and ``device_put`` transfers per-shard: the full
    index is never committed to a single device (which would OOM at
    exactly the scale this function exists for).
    """
    import numpy as np

    from jax.sharding import NamedSharding

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    rows = NamedSharding(mesh, jax.sharding.PartitionSpec(DATA_AXIS))
    if isinstance(corpus_emb, QuantizedCorpus):
        # padded rows: values 0 AND scale 0 — scores exactly 0 before the
        # index mask even applies
        vals = np.asarray(corpus_emb.values)
        scls = np.asarray(corpus_emb.scales)
        pad = (-vals.shape[0]) % n_dev
        if pad:
            vals = np.pad(vals, ((0, pad), (0, 0)))
            scls = np.pad(scls, (0, pad))
        return QuantizedCorpus(
            jax.device_put(vals, rows), jax.device_put(scls, rows)
        )
    arr = np.asarray(corpus_emb)
    pad = (-arr.shape[0]) % n_dev
    if pad:
        arr = np.pad(arr, ((0, pad), (0, 0)))
    return jax.device_put(arr, rows)


@functools.lru_cache(maxsize=32)  # bounded: entries hold compiled executables
def _sharded_topk_fn(mesh, k: int, n_real: int, quantized: bool = False):
    """Build (and cache) the jitted sharded top-k for one (mesh, k, N)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]

    def local(q, c_loc):
        rows_per = _corpus_rows(c_loc)
        # exactness: the true global top-k can contain at most
        # min(k, rows_per) entries from any one shard, which is exactly
        # the local cut — merging per-shard top-k_loc loses nothing
        k_loc = min(k, rows_per)
        i = jax.lax.axis_index(DATA_AXIS)
        if quantized:
            qv, qs = _quantize_queries(q)
            sim = _quantized_sim(qv, qs, c_loc)
        else:
            qn = l2_normalize(q.astype(jnp.float32), axis=1)
            cn = l2_normalize(c_loc.astype(jnp.float32), axis=1)
            sim = jnp.matmul(qn, cn.T, precision=jax.lax.Precision.HIGHEST)
        gidx = i * rows_per + jnp.arange(rows_per)
        sim = jnp.where(gidx[None, :] < n_real, sim, -jnp.inf)
        s_loc, i_loc = jax.lax.top_k(sim, k_loc)
        g_loc = jnp.take(gidx, i_loc)
        # comm is O(k) per device, not O(rows_per): gather only the
        # local winners, then re-rank the n_dev*k_loc candidates
        s_all = jax.lax.all_gather(s_loc, DATA_AXIS)  # [n_dev, Nq, k_loc]
        g_all = jax.lax.all_gather(g_loc, DATA_AXIS)
        nq = q.shape[0]
        s_all = jnp.moveaxis(s_all, 0, 1).reshape(nq, n_dev * k_loc)
        g_all = jnp.moveaxis(g_all, 0, 1).reshape(nq, n_dev * k_loc)
        # merged order is (device, local rank): exact ties resolve to
        # the lowest global index, same as the dense lax.top_k
        s, j = jax.lax.top_k(s_all, k)
        return s, jnp.take_along_axis(g_all, j, axis=1).astype(jnp.int32)

    corpus_spec = (
        QuantizedCorpus(P(DATA_AXIS), P(DATA_AXIS)) if quantized
        else P(DATA_AXIS)
    )
    # check_vma=False: the outputs ARE replicated (they come off an
    # all_gather over the only varying axis) but the vma inference can't
    # prove it through axis_index arithmetic — same situation as the
    # fused global-loss shard_map (parallel/global_loss.py)
    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), corpus_spec),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def sharded_retrieve_topk(
    query_emb: jax.Array,
    corpus_emb: jax.Array,
    *,
    k: int = 10,
    mesh=None,
    n_real: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """:func:`retrieve_topk` over a corpus row-sharded across the mesh.

    ``n_real``: the true row count when ``corpus_emb`` carries
    :func:`shard_corpus` padding (defaults to the array's row count).

    ``corpus_emb``: ideally already placed by :func:`shard_corpus` (it is
    re-placed here if not — pass it pre-sharded to avoid a reshard each
    call).  Each device scores queries against only ITS corpus rows and
    keeps a local top-k; the merge all-gathers O(k) winners per device —
    never the [Nq, Nc] scores — and re-ranks.  Equivalent to
    :func:`retrieve_topk` on the unsharded corpus up to matmul
    reduction-order noise in the scores (exact ties resolve to the
    lowest global index in both).  Queries are replicated (the serving
    case: small Nq, huge Nc).
    """
    if mesh is None:
        return retrieve_topk(query_emb, corpus_emb, k=k)
    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.shape[DATA_AXIS]
    quantized = isinstance(corpus_emb, QuantizedCorpus)
    if n_real is None:
        n_real = _corpus_rows(corpus_emb)
    if _corpus_rows(corpus_emb) % n_dev:
        # not yet padded/sharded (shard_corpus pads): do it now
        corpus_emb = shard_corpus(corpus_emb, mesh)
    k = min(k, n_real)
    return _sharded_topk_fn(mesh, k, n_real, quantized)(
        query_emb, corpus_emb
    )


def encode_corpus(encode_fn, batches, *, side: str = "video") -> jax.Array:
    """Encode an iterable of batches into a single embedding matrix.

    ``encode_fn(batch) -> (video_emb, text_emb)`` (e.g. Trainer.encode
    with state bound); ``side`` picks which modality to collect.
    """
    import numpy as np

    if side not in ("video", "text"):
        raise ValueError(f"side must be 'video' or 'text', got {side!r}")
    out = []
    for batch in batches:
        v, t = encode_fn(batch)
        out.append(np.asarray(v if side == "video" else t))
    if not out:
        raise ValueError("encode_corpus received no batches")
    return jnp.asarray(np.concatenate(out, axis=0))
