"""Blockwise (flash) attention for the encoder towers, in Pallas.

The reference has no model code at all (SURVEY.md §1) and its loss
consumes pooled ``[B, f_dim]`` vectors (loss.py:76), so sequence length
exists only inside OUR encoders.  SURVEY.md §5 flags long-context support
as the remaining stretch goal: standard attention materializes the
``[B, H, S, S]`` score tensor in HBM, capping sequence length; this module
computes attention with flash-style online softmax so only ``O(S·Dh)``
blocks ever leave VMEM.

Layout: inputs are ``[BH, S, Dh]`` (batch·heads folded into the leading
grid dimension).  The forward streams key/value blocks per query block,
keeping running max/sum scratch; it emits the output AND the per-row
logsumexp ``L`` (the residual that makes the backward rematerializable).
The backward is two kernels sharing the recomputed score tiles:

* dq: query-block resident, stream K/V — ``dq_i += scale·(P∘(dP−Δ))·K``.
* dk/dv: key-block resident, stream Q/dO in TRANSPOSED orientation
  (``[bk, bq]`` tiles, row factors as ``(1, bq)`` lane vectors) — a dim-0
  contraction or in-kernel transpose would cost Mosaic a relayout (see
  fused_crossclr.py's measured 10x note); the key-side mask is fed
  pre-shaped ``[bk, 1]`` for the same reason.

Per-row vectors (logsumexp, Δ) travel as ``[BH, S, 1]`` / ``[BH, 1, S]``
arrays so every in-kernel view is natively 2D — no 1D iota/reshape traps.

Key padding masks are supported (``[B, S]``, 1 = valid); masked logits
are −inf so their probability is exactly zero, and fully-masked query
rows emit zeros instead of NaN.

Attention-PROBABILITY dropout (r5) rides the online softmax after all:
the dropout mask is a stateless counter-based hash of the GLOBAL
``(bh, query, key)`` indices (murmur-style integer mixing of index
grids — no PRNG state, no [S, S] mask in HBM), so the forward, dq, and
transposed dk/dv kernels each regenerate the identical mask from their
own tile's index grids, in either orientation, with ~10 VPU integer ops
per tile.  Semantics match torch's ``dropout(softmax(s)) @ v``: the
kept unnormalized probabilities aggregate the values while the softmax
DENOMINATOR keeps every term (dropout zeroes normalized probabilities,
it does not renormalize), and the usual ``delta = rowsum(do∘out)``
backward identity survives because ``out`` already contains the mask.
The seed is a traced SMEM scalar — one compiled kernel serves every
training step's fresh mask.  The SMEM operand also carries traced GLOBAL
(query, key) index offsets, so a caller whose q/k tiles are a WINDOW of
a longer logical sequence (the ring-of-flash path, where each device
owns queries ``[my·s_loc, …)`` and visits key blocks owned by other
devices) regenerates the exact mask a single-chip run over the full
sequence would use — ring attention therefore supports true probability
dropout too (parallel/ring_attention.py).

Off-TPU the public entry runs the same math in jnp (or the kernel under
``interpret=True`` for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_crossclr import _PRECISIONS

__all__ = ["flash_attention", "flash_supported", "mha_reference"]

def _resolve_precision(precision):
    if precision is None:
        return jax.lax.Precision.DEFAULT
    if isinstance(precision, str):
        return _PRECISIONS[precision]
    return precision


_NEG_INF = float("-inf")
# finite floor for running maxima: −inf − (−inf) would NaN the rescale
_MAX_FLOOR = -1e30


def _pick_blocks(s: int) -> tuple[int, int] | None:
    """(query block, key block) sizes; None = shape unsupported."""

    def largest(limit):
        for t in (512, 256, 128, 64, 32, 16, 8):
            if t <= limit and s % t == 0:
                return t
        return None

    bq = largest(512)
    bk = largest(1024)
    if bq is None or bk is None:
        return None
    return bq, bk


def flash_supported(s: int, backend: str | None = None) -> bool:
    if _pick_blocks(s) is None:
        return False
    if backend is None:
        backend = jax.default_backend()
    return backend == "tpu"


def _out_struct(shape, dtype, *like):
    """ShapeDtypeStruct whose varying-mesh-axes set is the union of the
    operands' — required for pallas_call under ``shard_map(check_vma=True)``
    (the ring-of-flash path); outside shard_map the union is empty and
    equivalent to the default."""
    vma = frozenset().union(
        *(jax.typeof(a).vma for a in like if a is not None)
    )
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def _adapt_nomask(kernel, mask_pos: int):
    """Wrap a kernel so refs skip the (absent) mask argument slot."""

    def wrapped(*refs):
        args = refs[:mask_pos] + (None,) + refs[mask_pos:]
        return kernel(*args)

    return wrapped


def _hash_keep(q_idx, k_idx, bh_term, seed, rate: float):
    """Stateless dropout keep-mask from GLOBAL (query, key) index grids.

    Each index is mixed NONLINEARLY on its own (xorshift-multiply) before
    the words are combined with the per-(batch·head) term and the traced
    step seed, then passed through a murmur3-style finalizer → uniform
    [0, 1) → ``keep = u ≥ rate``.  The per-index nonlinearity matters: a
    linear pre-mix ``q·C1 + k·C2`` makes every index pair offset by a
    lattice vector (Δq, Δk) with ``Δq·C1 + Δk·C2 ≡ 0 (mod 2³²)`` collide
    for EVERY seed — deterministic perfectly-correlated drop decisions
    along a lattice direction on long sequences.  With both indices mixed
    nonlinearly, residual collisions are the generic ~S²/2³² birthday
    ones.  Orientation-independent by construction: the transposed dk/dv
    kernel computes the same element mask from its own [bk, bq] index
    grids.  Not cryptographic — dropout needs decorrelated bits, not
    unpredictability (the mask is regenerated bit-identically by all
    three kernels, which the exactness tests pin against a jnp oracle
    using this same function)."""
    hq = q_idx.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    hq = hq ^ (hq >> 15)
    hq = hq * jnp.uint32(0x735A2D97)
    hk = k_idx.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
    hk = hk ^ (hk >> 13)
    hk = hk * jnp.uint32(0xC2B2AE3D)
    u = hq + hk + bh_term + seed
    u = u ^ (u >> 16)
    u = u * jnp.uint32(0x85EBCA6B)
    u = u ^ (u >> 13)
    u = u * jnp.uint32(0xC2B2AE35)
    u = u ^ (u >> 16)
    # top-24-bit uniform; via int32 (always non-negative after the shift)
    # because Mosaic has no uint32->float32 cast
    unif = (u >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    return unif >= rate


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


_BH_PRIME = 0x27D4EB2F  # per-(batch·head) decorrelation term for _hash_keep


def _keep_from_grids(seed_ref, b, q_idx_local, k_idx_local, dropout: float):
    """Shared mask-regeneration core for ALL THREE kernels: unpack the
    (1, 4) SMEM operand ``[seed, q_offset, k_offset, bh_offset]``, lift
    the caller's LOCAL index grids to global, and hash.  Offsets are 0
    except under ring attention, where they place this call's tiles
    inside the full logical sequence and — under a dp×sp layout — this
    shard's rows inside the GLOBAL folded batch·head range, so
    data-parallel shards draw decorrelated masks.  One source of truth:
    the fwd/dq (rows × cols) and transposed dk/dv kernels must stay
    bit-identical, which the exactness tests pin against the jnp
    oracle."""
    q_off = seed_ref[0, 1].astype(jnp.int32)
    k_off = seed_ref[0, 2].astype(jnp.int32)
    bh_off = seed_ref[0, 3].astype(jnp.int32)
    bh_term = (b + bh_off + 1).astype(jnp.uint32) * jnp.uint32(_BH_PRIME)
    seed = seed_ref[0, 0].astype(jnp.int32).astype(jnp.uint32)
    return _hash_keep(q_off + q_idx_local, k_off + k_idx_local, bh_term,
                      seed, dropout)


def _tile_keep(seed_ref, bq: int, bk: int, dropout: float):
    """Dropout keep-mask for THIS grid tile — the forward and dq kernels'
    orientation (query rows × key cols)."""
    q_idx = (pl.program_id(1) * bq
             + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0))
    k_idx = (pl.program_id(2) * bk
             + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1))
    return _keep_from_grids(seed_ref, pl.program_id(0), q_idx, k_idx,
                            dropout)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, *, scale: float, precision,
                dropout: float):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], _MAX_FLOOR)
        l_scr[:] = jnp.zeros_like(l_scr[:])
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    q = q_ref[0]  # [bq, dh]
    k = k_ref[0]  # [bk, dh]
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # [bq, bk]
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] > 0.5, s, _NEG_INF)  # mask: [1, bk]

    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    m_new = jnp.maximum(m_new, _MAX_FLOOR)  # all-masked block: stay finite
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # exp(-inf - finite) = 0 for masked keys
    # the softmax DENOMINATOR keeps every term (torch dropout zeroes
    # normalized probabilities without renormalizing); only the value
    # aggregation sees the mask
    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    if dropout > 0.0:
        bq, bk = p.shape
        p_v = jnp.where(_tile_keep(seed_ref, bq, bk, dropout), p, 0.0)
    else:
        p_v = p
    acc_scr[:] = acc_scr[:] * alpha + jnp.dot(
        p_v, v_ref[0].astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=precision,
    )
    m_scr[:] = m_new

    @pl.when(j == nj - 1)
    def _fin():
        l = l_scr[:]
        # fully-masked query rows: emit 0, lse = floor (p was 0 everywhere)
        safe_l = jnp.where(l > 0, l, 1.0)
        inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
        o_ref[0] = (acc_scr[:] * (inv_keep / safe_l)).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(safe_l)


def _seed_spec():
    # (1, 4) SMEM row: [seed, q_offset, k_offset, bh_offset] — _tile_keep
    return pl.BlockSpec((1, 4), lambda *_: (0, 0), memory_space=pltpu.SMEM)


_SEED_MOD = float(1 << 23)


def fold_seed(seed):
    """Canonicalize a dropout seed to [0, 2^23) THROUGH an fp32 carrier.

    Every consumer — `seed_operand` (the kernels' SMEM word) and
    `dropout_keep_mask` (the jnp fallback/oracle) — folds through this
    one function, so the pallas and jnp paths drop identical entries for
    ANY input seed, including values ≥ 2^24 that fp32 would otherwise
    round differently from an exact integer path.  The fp32 cast rounds
    first (to nearest) exactly like the SMEM carrier does; the fmod is
    then exact in fp32 and lands in [0, 2^23), where fp32 is integral."""
    s = jnp.asarray(seed, jnp.float32)
    s = jnp.mod(s, jnp.float32(_SEED_MOD))
    return s


def seed_operand(seed, q_offset=0, k_offset=0, bh_offset=0):
    """Build the kernels' (1, 4) fp32 SMEM dropout operand.  fp32 is
    exact for values < 2^24 and keeps the custom_vjp tangent story
    trivial (int operands would need float0 cotangents); the seed is
    folded to its low 23 bits via `fold_seed` (identically on the jnp
    path), offsets are sequence positions, and ``bh_offset`` is this
    shard's base in the GLOBAL folded batch·head range (0 except under
    a dp-sharded ring call; exact below 2^24 rows·heads)."""
    row = jnp.stack([
        fold_seed(seed).reshape(()),
        jnp.asarray(q_offset, jnp.float32).reshape(()),
        jnp.asarray(k_offset, jnp.float32).reshape(()),
        jnp.asarray(bh_offset, jnp.float32).reshape(()),
    ])
    return row.reshape(1, 4)


def _flash_fwd(q, k, v, mask_row, seed_arr, scale, bq, bk, interpret,
               precision, dropout):
    bh, s, dh = q.shape
    grid = (bh, s // bq, s // bk)
    kernel = functools.partial(_fwd_kernel, scale=scale,
                               precision=_resolve_precision(precision),
                               dropout=dropout)
    row3 = lambda b, i, j: (b, i, 0)  # noqa: E731
    col3 = lambda b, i, j: (b, j, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, bq, dh), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), col3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), col3, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if dropout > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, seed_arr)
    else:
        kernel = _adapt_nomask(kernel, 0)  # no seed operand
    if mask_row is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_row)
    else:
        kernel = _adapt_nomask(kernel, 4 if dropout > 0.0 else 3)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bq, dh), row3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), row3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((bh, s, dh), q.dtype, q, k, v, mask_row),
            _out_struct((bh, s, 1), jnp.float32, q, k, v, mask_row),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               mask_ref, dq_ref, acc_scr, *, scale: float, precision,
               dropout: float):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])

    q = q_ref[0]
    k = k_ref[0]
    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    if mask_ref is not None:
        s = jnp.where(mask_ref[0] > 0.5, s, _NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # lse: [bq, 1]; 0 on masked keys
    dp = jax.lax.dot_general(
        do_ref[0].astype(jnp.float32), v_ref[0].astype(jnp.float32),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )
    if dropout > 0.0:
        # dP flows only through kept entries (scaled 1/(1−r)); delta =
        # rowsum(do∘out) already carries the mask via out
        bq, bk = p.shape
        keep = _tile_keep(seed_ref, bq, bk, dropout)
        dp = jnp.where(keep, dp * (1.0 / (1.0 - dropout)), 0.0)
    ds = p * (dp - delta_ref[0])  # delta: [bq, 1]
    acc_scr[:] = acc_scr[:] + jnp.dot(
        ds, k.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(j == nj - 1)
    def _fin():
        dq_ref[0] = (scale * acc_scr[:]).astype(dq_ref.dtype)


def _dkv_kernel(seed_ref, k_ref, v_ref, q_ref, do_ref, lseT_ref, deltaT_ref,
                mask_ref, dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                precision, dropout: float):
    # grid (bh, key block, query block) — everything transposed: [bk, bq]
    # score tiles, per-row factors as (1, bq) lane vectors, the key-side
    # mask pre-shaped (bk, 1) — no in-kernel relayouts anywhere
    i = pl.program_id(2)
    ni = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr[:])
        dv_scr[:] = jnp.zeros_like(dv_scr[:])

    k = k_ref[0]  # [bk, dh]
    q = q_ref[0]  # [bq, dh]
    do = do_ref[0].astype(jnp.float32)
    sT = scale * jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=precision,
    )  # [bk, bq]
    if mask_ref is not None:
        sT = jnp.where(mask_ref[0] > 0.5, sT, _NEG_INF)  # mask: [bk, 1]
    pT = jnp.exp(sT - lseT_ref[0])  # lseT: [1, bq]
    if dropout > 0.0:
        # the SAME element mask as the forward, regenerated here in
        # transposed orientation from this tile's own index grids: grid
        # dim 1 is the KEY block and dim 2 the QUERY block in this
        # kernel, and the iota dims swap to the [bk, bq] layout
        bk_, bq_ = pT.shape
        q_idx = (pl.program_id(2) * bq_
                 + jax.lax.broadcasted_iota(jnp.int32, (bk_, bq_), 1))
        k_idx = (pl.program_id(1) * bk_
                 + jax.lax.broadcasted_iota(jnp.int32, (bk_, bq_), 0))
        keepT = _keep_from_grids(seed_ref, pl.program_id(0), q_idx, k_idx,
                                 dropout)
        inv = 1.0 / (1.0 - dropout)
        pT_v = jnp.where(keepT, pT * inv, 0.0)  # P̂ᵀ for dv
        dpT = jax.lax.dot_general(
            v_ref[0].astype(jnp.float32), do,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )
        dpT = jnp.where(keepT, dpT * inv, 0.0)
    else:
        pT_v = pT
        dpT = jax.lax.dot_general(
            v_ref[0].astype(jnp.float32), do,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=precision,
        )  # [bk, bq]
    dv_scr[:] = dv_scr[:] + jnp.dot(
        pT_v, do, preferred_element_type=jnp.float32, precision=precision
    )
    dsT = pT * (dpT - deltaT_ref[0])
    dk_scr[:] = dk_scr[:] + jnp.dot(
        dsT, q.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(i == ni - 1)
    def _fin():
        dk_ref[0] = (scale * dk_scr[:]).astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, mask_row, seed_arr, out, lse, do, scale, bq, bk,
               interpret, precision, dropout):
    prec = _resolve_precision(precision)
    bh, s, dh = q.shape
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32),
        axis=-1,
        keepdims=True,
    )  # [bh, s, 1]

    row3 = lambda b, i, j: (b, i, 0)  # noqa: E731
    col3 = lambda b, i, j: (b, j, 0)  # noqa: E731

    dq_kernel = functools.partial(_dq_kernel, scale=scale, precision=prec,
                                  dropout=dropout)
    in_specs = [
        pl.BlockSpec((1, bq, dh), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), col3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), col3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, dh), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 1), row3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, 1), row3, memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, do, lse, delta]
    if dropout > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, seed_arr)
    else:
        dq_kernel = _adapt_nomask(dq_kernel, 0)
    if mask_row is not None:
        in_specs.append(
            pl.BlockSpec((1, 1, bk), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_row)
    else:
        dq_kernel = _adapt_nomask(dq_kernel, 7 if dropout > 0.0 else 6)
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, s // bq, s // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, dh), row3, memory_space=pltpu.VMEM),
        out_shape=_out_struct((bh, s, dh), q.dtype, q, k, v, do, mask_row),
        scratch_shapes=[pltpu.VMEM((bq, dh), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    # transposed-orientation kernel: grid (bh, key, query)
    key3 = lambda b, j, i: (b, j, 0)  # noqa: E731
    qry3 = lambda b, j, i: (b, i, 0)  # noqa: E731
    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, precision=prec,
                                   dropout=dropout)
    lse_t = lse.reshape(bh, 1, s)
    delta_t = delta.reshape(bh, 1, s)
    in_specs = [
        pl.BlockSpec((1, bk, dh), key3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dh), key3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, dh), qry3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bq, dh), qry3, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq), lambda b, j, i: (b, 0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [k, v, q, do, lse_t, delta_t]
    if dropout > 0.0:
        in_specs.insert(0, _seed_spec())
        args.insert(0, seed_arr)
    else:
        dkv_kernel = _adapt_nomask(dkv_kernel, 0)
    if mask_row is not None:
        # key mask pre-shaped [bh, s, 1] so the in-kernel view is (bk, 1)
        in_specs.append(
            pl.BlockSpec((1, bk, 1), key3, memory_space=pltpu.VMEM)
        )
        args.append(mask_row.reshape(bh, s, 1))
    else:
        dkv_kernel = _adapt_nomask(dkv_kernel, 7 if dropout > 0.0 else 6)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(bh, s // bk, s // bq),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, bk, dh), key3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dh), key3, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            _out_struct((bh, s, dh), k.dtype, q, k, v, do, mask_row),
            _out_struct((bh, s, dh), v.dtype, q, k, v, do, mask_row),
        ),
        scratch_shapes=[
            pltpu.VMEM((bk, dh), jnp.float32),
            pltpu.VMEM((bk, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP + public entry
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash(q, k, v, mask_row, seed_arr, scale, bq, bk, interpret, precision,
           dropout):
    out, _ = _flash_fwd(q, k, v, mask_row, seed_arr, scale, bq, bk,
                        interpret, precision, dropout)
    return out


def _flash_vjp_fwd(q, k, v, mask_row, seed_arr, scale, bq, bk, interpret,
                   precision, dropout):
    out, lse = _flash_fwd(q, k, v, mask_row, seed_arr, scale, bq, bk,
                          interpret, precision, dropout)
    return out, (q, k, v, mask_row, seed_arr, out, lse)


def _flash_vjp_bwd(scale, bq, bk, interpret, precision, dropout, residuals,
                   do):
    q, k, v, mask_row, seed_arr, out, lse = residuals
    dq, dk, dv = _flash_bwd(
        q, k, v, mask_row, seed_arr, out, lse, do, scale, bq, bk, interpret,
        precision, dropout,
    )
    dmask = None if mask_row is None else jnp.zeros_like(mask_row)
    return dq, dk, dv, dmask, jnp.zeros_like(seed_arr)  # fp32 seed: no grad


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def dropout_keep_mask(b, h, s, seed, rate, sk=None, q_offset=0, k_offset=0,
                      bh_offset=0):
    """The flash kernels' exact attention-dropout mask, materialized in
    jnp as ``[B, H, S, Sk]`` — the oracle/fallback companion of the
    in-kernel `_hash_keep` (identical bits, so the jnp path and the
    kernels compute the SAME dropped attention; the seed rides the same
    `fold_seed` fp32 fold the SMEM operand does, so agreement holds for
    any seed value).  ``q_offset``/``k_offset`` place a rectangular
    window inside a longer logical sequence and ``bh_offset`` places
    these rows inside the global folded batch·head range (the ring
    path's per-block / per-dp-shard view)."""
    sk = s if sk is None else sk
    q_idx = (q_offset + jnp.arange(s, dtype=jnp.int32))[:, None] * jnp.ones(
        (1, sk), jnp.int32
    )
    k_idx = (k_offset + jnp.arange(sk, dtype=jnp.int32))[None, :] * jnp.ones(
        (s, 1), jnp.int32
    )
    bh = jnp.arange(b * h, dtype=jnp.int32) + 1 + jnp.asarray(
        bh_offset, jnp.float32
    ).astype(jnp.int32)
    bh_term = (bh.astype(jnp.uint32) * jnp.uint32(_BH_PRIME))[:, None, None]
    seed_u = fold_seed(seed).astype(jnp.int32).astype(jnp.uint32)
    keep = _hash_keep(
        q_idx[None], k_idx[None], bh_term, seed_u, rate
    )  # [BH, S, Sk]
    return keep.reshape(b, h, s, sk)


def mha_reference(q, k, v, mask=None, *, scale=None, dropout_rate=0.0,
                  dropout_seed=0):
    """Plain jnp multi-head attention over ``[B, H, S, Dh]``; the fallback
    path and the test oracle for the kernels.  ``mask``: ``[B, S]`` key
    padding (1 = valid).  ``dropout_rate`` > 0 applies the kernels' exact
    hash-mask attention-probability dropout (torch semantics: normalized
    probabilities zeroed, survivors scaled 1/(1−rate))."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    s = scale * jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    any_valid = None
    if mask is not None:
        key_mask = mask.astype(bool)[:, None, None, :]  # [B,1,1,S]
        s = jnp.where(key_mask, s, _NEG_INF)
        any_valid = jnp.any(key_mask, axis=-1, keepdims=True)
        s = jnp.where(any_valid, s, 0.0)
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        b, h, sq, _ = p.shape
        keep = dropout_keep_mask(b, h, sq, dropout_seed, dropout_rate)
        p = jnp.where(keep, p * (1.0 / (1.0 - dropout_rate)), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if any_valid is not None:
        out = jnp.where(any_valid, out, 0.0)
    return out.astype(q.dtype)


def fold_heads(q, k, v, mask):
    """Fold ``[B,H,S,Dh]`` → the flash-kernel layout ``[BH,S,Dh_pad]``
    (head dim zero-padded to the 128 lane width — zero columns are inert
    in both the scores and the value aggregation) and the optional
    ``[B,S]`` key mask → ``[BH,1,S]`` fp32 rows (head-repeated, b-major
    like the fold).  The single source of the kernel layout contract,
    shared by :func:`flash_attention` and the ring-of-flash path in
    ``parallel.ring_attention``."""
    b, h, s, dh = q.shape
    pad = (-dh) % 128

    def f(x):
        x = x.reshape(b * h, s, dh)
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad))) if pad else x

    mask_row = (
        None
        if mask is None
        else jnp.repeat(mask.astype(jnp.float32), h, axis=0).reshape(
            b * h, 1, s
        )
    )
    return f(q), f(k), f(v), mask_row


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    scale: float | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
    precision: str | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
) -> jax.Array:
    """Blockwise attention.  ``q/k/v``: ``[B, H, S, Dh]``; ``mask``:
    optional ``[B, S]`` key-padding mask (1 = valid).  Returns
    ``[B, H, S, Dh]`` in the query dtype.  Differentiable (rematerializing
    custom VJP); scores never materialize beyond ``[bq, bk]`` tiles.
    ``precision``: None/"default" = fast MXU passes (training towers are
    bf16 anyway); "highest" = fp32-exact dots for comparisons.
    ``dropout_rate``: attention-PROBABILITY dropout (torch semantics:
    normalized probabilities zeroed, survivors scaled 1/(1−rate)); the
    mask is a stateless hash of the global (bh, query, key) indices and
    ``dropout_seed`` (traced — may be a fresh per-step scalar without
    recompiling; the seed is canonicalized by `fold_seed` — an fp32
    round followed by mod 2^23 — so distinct seeds should live in
    [0, 2^23)).  The jnp fallback applies the bit-identical mask through
    the same fold, so both paths drop the same entries for any seed.
    """
    b, h, s, dh = q.shape
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
    dropout_rate = float(dropout_rate)
    if scale is None:
        scale = dh**-0.5
    if use_pallas is None:
        use_pallas = flash_supported(s) or interpret
    blocks = _pick_blocks(s)
    if not use_pallas or blocks is None:
        return mha_reference(q, k, v, mask, scale=scale,
                             dropout_rate=dropout_rate,
                             dropout_seed=dropout_seed)
    bq, bk = blocks
    qf, kf, vf, mask_row = fold_heads(q, k, v, mask)
    seed_arr = seed_operand(dropout_seed)
    out = _flash(
        qf, kf, vf, mask_row, seed_arr, float(scale), bq, bk, interpret,
        precision, dropout_rate,
    )
    if (-dh) % 128:
        out = out[:, :, :dh]
    return out.reshape(b, h, s, dh)
