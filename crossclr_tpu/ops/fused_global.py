"""Fused Pallas kernels for the GLOBAL-negative CrossCLR loss.

The single-chip kernel (fused_crossclr.py) assumes anchor rows == anchor
columns.  Under all-gathered global negatives (BASELINE.json config 5:
v5e-16, bsz 32k) each device owns a row *block* of the loss: its local
anchors against the full gathered candidate set.  These kernels compute,
for local rows ``r`` at global offset ``off``:

    lse_r = log( Σ_j exp(s·aᵣ·o_all_j) + Σ_{j≠off+r} exp(w·s·aᵣ·a_all_j) + 1 )

and the three gradients (w.r.t. local rows, gathered anchors, gathered
others).  Combined with ``jax.lax.all_gather`` under ``shard_map``, the
transpose of the gather (psum_scatter) turns the gathered-array gradients
into exact per-shard gradients — see parallel/global_loss.py.

Without the fused path, a [b_loc, 2B] softmax materializes per device
(b_loc=4096, B=32768 → 1 GiB of fp32 logits); here only [b_loc, 1]
logsumexps and [*, D] gradients touch HBM.

The row offset AND the temperature scale are passed as traced fp32
scalars (SMEM), so one compiled kernel serves every device in the mesh
and any temperature — including a CLIP-style learnable one.  The backward
additionally returns d loss/d scale (per-row Σ p⊙z accumulations summed
and divided by scale outside, the same identity as fused_dual.py), so
``jax.grad`` w.r.t. a live temperature is exact on the global fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_crossclr import (
    _NEG_INF,
    _dot,
    _dot_nt,
    _fetch_cast,
    _lane_pad,
    _pad_lanes,
    _pick_tiles,
    _resolve_precision,
    _tier_name,
    check_explicit_tiles,
)

__all__ = ["cross_clr_fused", "fused_lse_rows", "rows_supported"]

# Finite "excluded candidate" logit for the PRUNED variant (full CrossCLR:
# influential negatives and the self column are dropped, not zeroed —
# functional._pruned_direction_rows semantics).  Real logits are bounded
# by |s| ≤ 3333 under the CLIP temperature clamp, so −1e9 never collides;
# exp(−1e9 − m) underflows to exactly 0.0, and unlike −inf it keeps the
# running max and the p⊙z temperature-gradient products NaN-free
# (0 · −1e9 = −0.0, while 0 · −inf would be NaN).
#
# Online-max note: a FULLY-masked tile sets the running max to _MASKED
# itself and its entries momentarily contribute exp(0) = 1 each — the
# accumulation still ends CORRECT because the next real logit (every row
# always keeps its positive) rescales the sum by exp(_MASKED − real) = 0,
# wiping the bogus terms.  Do NOT "fix" this with a finite max floor: any
# floor above _MASKED silently corrupts rows whose genuine kept logits
# all fall below it (extreme 1/τ), while the rescale wipe is scale-free.
_MASKED = -1e9


def _global_ids(i, j, off_ref, tb: int, tc: int, transposed: bool = False):
    """Global (row, candidate) index grids for tile (i, j).

    ``transposed=True`` yields [TC, TB] grids (candidates on axis 0) for
    kernels that compute in transposed orientation — one helper so the
    offset/masking convention lives in a single place.
    """
    off = off_ref[0, 0].astype(jnp.int32)
    if transposed:
        cols = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tc, tb), 0)
        rows = off + i * tb + jax.lax.broadcasted_iota(jnp.int32, (tc, tb), 1)
    else:
        rows = off + i * tb + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
        cols = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 1)
    return rows, cols


# ---------------------------------------------------------------------------
# forward: lse over the virtual [b_loc, 2B] candidates
# ---------------------------------------------------------------------------


def _rows_lse_kernel(
    *refs,
    neg_weight,
    tb,
    tc,
    precision,
    pruned,
):
    if pruned:
        (off_ref, s_ref, ki_ref, ka_ref, a_row_ref, o_all_ref, a_all_ref,
         lse_ref, m_scr, l_scr) = refs
    else:
        (off_ref, s_ref, a_row_ref, o_all_ref, a_all_ref,
         lse_ref, m_scr, l_scr) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    scale = s_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr[:], _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr[:])

    a_i = a_row_ref[:]
    inter = scale * _dot_nt(a_i, o_all_ref[:], precision)
    intra = (neg_weight * scale) * _dot_nt(a_i, a_all_ref[:], precision)
    rows, cols = _global_ids(i, j, off_ref, tb, tc)
    if pruned:
        # full-CrossCLR: pruned negatives and the self column are DROPPED
        # (−1e9 ⇒ exp underflows to 0); the positive diagonal always kept
        on_diag = rows == cols
        inter = jnp.where((ki_ref[:] > 0.5) | on_diag, inter, _MASKED)
        intra = jnp.where((ka_ref[:] > 0.5) & ~on_diag, intra, _MASKED)
    else:
        intra = jnp.where(rows == cols, 0.0, intra)  # parity: zeroed, not dropped

    m_prev = m_scr[:]
    m_new = jnp.maximum(
        m_prev,
        jnp.maximum(
            jnp.max(inter, axis=1, keepdims=True),
            jnp.max(intra, axis=1, keepdims=True),
        ),
    )
    l_new = (
        l_scr[:] * jnp.exp(m_prev - m_new)
        + jnp.sum(jnp.exp(inter - m_new), axis=1, keepdims=True)
        + jnp.sum(jnp.exp(intra - m_new), axis=1, keepdims=True)
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(j == nj - 1)
    def _finalize():
        lse_ref[:] = m_new + jnp.log(l_new)


# ---------------------------------------------------------------------------
# backward 1: gradient w.r.t. the LOCAL anchor rows
# ---------------------------------------------------------------------------


def _rows_bwd_rows_kernel(
    *refs,
    neg_weight,
    tb,
    tc,
    precision,
    pruned,
):
    if pruned:
        (off_ref, s_ref, ki_ref, ka_ref, a_row_ref, lse_row_ref, g_row_ref,
         o_all_ref, a_all_ref, out_ref, ds_row_ref, acc_scr, ds_scr) = refs
    else:
        (off_ref, s_ref, a_row_ref, lse_row_ref, g_row_ref,
         o_all_ref, a_all_ref, out_ref, ds_row_ref, acc_scr, ds_scr) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    scale = s_ref[0, 0]

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr[:])
        ds_scr[:] = jnp.zeros_like(ds_scr[:])

    a_i = a_row_ref[:]
    o_j = o_all_ref[:]
    a_j = a_all_ref[:]
    lse_i = lse_row_ref[:]
    g_i = g_row_ref[:]
    rows, cols = _global_ids(i, j, off_ref, tb, tc)

    z_inter = scale * _dot_nt(a_i, o_j, precision)
    if pruned:
        # masked z = −1e9 makes p underflow to exactly 0: excluded
        # candidates get no feature gradient and contribute 0 to dτ
        z_inter = jnp.where(
            (ki_ref[:] > 0.5) | (rows == cols), z_inter, _MASKED
        )
    p = g_i * jnp.exp(z_inter - lse_i)
    acc = jnp.dot(p, o_j, preferred_element_type=jnp.float32, precision=precision)

    z_intra = (neg_weight * scale) * _dot_nt(a_i, a_j, precision)
    if pruned:
        z_intra = jnp.where(
            (ka_ref[:] > 0.5) & (rows != cols), z_intra, _MASKED
        )
        q = g_i * jnp.exp(z_intra - lse_i)
    else:
        q = jnp.where(rows == cols, 0.0, g_i * jnp.exp(z_intra - lse_i))
    acc = acc + neg_weight * jnp.dot(
        q, a_j, preferred_element_type=jnp.float32, precision=precision
    )

    acc_scr[:] = acc_scr[:] + acc
    # temperature gradient: d lse_r/d s = (Σ p⊙z_inter + Σ q⊙z_intra)/s
    # (the zeroed-diagonal logit is the constant 0 — q excludes it).
    # Accumulated per ROW (not a global scalar) so the i grid dimension
    # stays parallel-safe; the wrapper sums rows and divides by s.
    ds_scr[:] = ds_scr[:] + jnp.sum(
        p * z_inter + q * z_intra, axis=1, keepdims=True
    )

    @pl.when(j == nj - 1)
    def _finalize():
        out_ref[:] = scale * acc_scr[:]
        ds_row_ref[:] = ds_scr[:]


# ---------------------------------------------------------------------------
# backward 2: gradients w.r.t. the GATHERED candidate arrays
# ---------------------------------------------------------------------------


def _rows_bwd_cols_kernel(
    *refs,
    neg_weight,
    tb,
    tc,
    precision,
    pruned,
):
    # grid is (col tiles, row tiles): j parallel, i arbitrary.  Everything
    # is computed in TRANSPOSED orientation ([TC, TB] logits, row factors
    # as (1, TB) lane vectors): a dim-0 contraction (Pᵀ·A) or an in-kernel
    # transpose costs Mosaic a lossy/slow relayout — see the symmetric
    # backward kernel's layout note.  The pruning masks therefore arrive
    # pre-shaped as [TC, 1] sublane vectors (candidates on axis 0).
    if pruned:
        (off_ref, s_ref, kiT_ref, kaT_ref, o_all_ref, a_all_ref, a_row_ref,
         lse_rowT_ref, g_rowT_ref, d_o_ref, d_a_ref, do_scr, da_scr) = refs
    else:
        (off_ref, s_ref, o_all_ref, a_all_ref, a_row_ref,
         lse_rowT_ref, g_rowT_ref, d_o_ref, d_a_ref, do_scr, da_scr) = refs
    j = pl.program_id(0)
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    scale = s_ref[0, 0]

    @pl.when(i == 0)
    def _init():
        do_scr[:] = jnp.zeros_like(do_scr[:])
        da_scr[:] = jnp.zeros_like(da_scr[:])

    a_i = a_row_ref[:]  # [TB, D]
    o_j = o_all_ref[:]  # [TC, D]
    a_j = a_all_ref[:]  # [TC, D]
    lse_iT = lse_rowT_ref[:]  # [1, TB]
    g_iT = g_rowT_ref[:]  # [1, TB]
    row_ids, cand_ids = _global_ids(i, j, off_ref, tb, tc, transposed=True)

    # zT[c, r] = s·o_c·a_r — transposed inter logits
    zT_inter = scale * _dot_nt(o_j, a_i, precision)  # [TC, TB]
    if pruned:
        zT_inter = jnp.where(
            (kiT_ref[:] > 0.5) | (cand_ids == row_ids), zT_inter, _MASKED
        )
    pT = g_iT * jnp.exp(zT_inter - lse_iT)
    do_scr[:] = do_scr[:] + _dot(pT, a_i, precision)  # [TC, D]

    zT_intra = (neg_weight * scale) * _dot_nt(a_j, a_i, precision)
    if pruned:
        zT_intra = jnp.where(
            (kaT_ref[:] > 0.5) & (cand_ids != row_ids), zT_intra, _MASKED
        )
        qT = g_iT * jnp.exp(zT_intra - lse_iT)
    else:
        qT = jnp.where(
            cand_ids == row_ids, 0.0, g_iT * jnp.exp(zT_intra - lse_iT)
        )
    da_scr[:] = da_scr[:] + neg_weight * _dot(qT, a_i, precision)

    @pl.when(i == ni - 1)
    def _finalize():
        d_o_ref[:] = scale * do_scr[:]
        d_a_ref[:] = scale * da_scr[:]


# ---------------------------------------------------------------------------
# wrappers + custom VJP
# ---------------------------------------------------------------------------


def _compiler_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )


def _off_spec():
    return pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)


def _rows_lse_fwd(anchor_rows, anchor_all, other_all, off, s_arr, ki, ka,
                  neg_weight, tb, tc, interpret, precision, pruned):
    bl, d = anchor_rows.shape
    bg = anchor_all.shape[0]
    kernel = functools.partial(
        _rows_lse_kernel, neg_weight=neg_weight, tb=tb, tc=tc,
        precision=_resolve_precision(precision), pruned=pruned,
    )
    mask_specs = (
        [pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM)] * 2
        if pruned
        else []
    )
    mask_args = (ki, ka) if pruned else ()
    return pl.pallas_call(
        kernel,
        grid=(bl // tb, bg // tc),
        in_specs=[
            _off_spec(),
            _off_spec(),
            *mask_specs,
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bl, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(off, s_arr, *mask_args, anchor_rows, other_all, anchor_all)


def _rows_bwd(anchor_rows, anchor_all, other_all, off, s_arr, ki, ka, lse, g,
              neg_weight, tb, tc, interpret, precision, pruned):
    bl, d = anchor_rows.shape
    bg = anchor_all.shape[0]
    prec = _resolve_precision(precision)

    row_mask_specs = (
        [pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM)] * 2
        if pruned
        else []
    )
    row_mask_args = (ki, ka) if pruned else ()
    d_rows, ds_rows = pl.pallas_call(
        functools.partial(
            _rows_bwd_rows_kernel, neg_weight=neg_weight,
            tb=tb, tc=tc, precision=prec, pruned=pruned,
        ),
        grid=(bl // tb, bg // tc),
        in_specs=[
            _off_spec(),
            _off_spec(),
            *row_mask_specs,
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bl, d), jnp.float32),
            jax.ShapeDtypeStruct((bl, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, d), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(off, s_arr, *row_mask_args, anchor_rows, lse, g, other_all, anchor_all)

    lse_t = lse.reshape(1, bl)
    g_t = g.reshape(1, bl)
    # the transposed kernel wants per-candidate masks as [BG, 1] sublane
    # vectors (candidates on axis 0) — reshaped OUTSIDE the kernel, where
    # the relayout is an ordinary cheap XLA op
    col_mask_specs = (
        [pl.BlockSpec((tc, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM)] * 2
        if pruned
        else []
    )
    col_mask_args = (ki.reshape(bg, 1), ka.reshape(bg, 1)) if pruned else ()
    d_other, d_anchor_all = pl.pallas_call(
        functools.partial(
            _rows_bwd_cols_kernel, neg_weight=neg_weight,
            tb=tb, tc=tc, precision=prec, pruned=pruned,
        ),
        grid=(bg // tc, bl // tb),
        in_specs=[
            _off_spec(),
            _off_spec(),
            *col_mask_specs,
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda j, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tb), lambda j, i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bg, d), jnp.float32),
            jax.ShapeDtypeStruct((bg, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tc, d), jnp.float32),
            pltpu.VMEM((tc, d), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        off, s_arr, *col_mask_args,
        other_all, anchor_all, anchor_rows, lse_t, g_t,
    )

    return d_rows, d_anchor_all, d_other, ds_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _fused_lse_rows(anchor_rows, anchor_all, other_all, off, s_arr, ki, ka,
                    neg_weight, tb, tc, interpret, precision, pruned):
    anchor_rows, anchor_all, other_all = _fetch_cast(
        precision, anchor_rows, anchor_all, other_all
    )
    return _rows_lse_fwd(
        anchor_rows, anchor_all, other_all, off, s_arr, ki, ka,
        neg_weight, tb, tc, interpret, precision, pruned,
    )


def _fused_lse_rows_fwd(anchor_rows, anchor_all, other_all, off, s_arr,
                        ki, ka, neg_weight, tb, tc, interpret, precision,
                        pruned):
    lse = _fused_lse_rows(
        anchor_rows, anchor_all, other_all, off, s_arr, ki, ka,
        neg_weight, tb, tc, interpret, precision, pruned,
    )
    return lse, (anchor_rows, anchor_all, other_all, off, s_arr, ki, ka, lse)


def _fused_lse_rows_bwd(neg_weight, tb, tc, interpret, precision, pruned,
                        residuals, g):
    anchor_rows, anchor_all, other_all, off, s_arr, ki, ka, lse = residuals
    g = jnp.asarray(g, jnp.float32).reshape(-1, 1)
    rk, ak, ok = _fetch_cast(precision, anchor_rows, anchor_all, other_all)
    d_rows, d_anchor_all, d_other, ds_rows = _rows_bwd(
        rk, ak, ok, off, s_arr, ki, ka, lse, g,
        neg_weight, tb, tc, interpret, precision, pruned,
    )
    # kernel rows accumulate Σ g·(p⊙z) = s · dL/ds per row
    ds = (jnp.sum(ds_rows) / s_arr[0, 0]).reshape(s_arr.shape)
    return (
        d_rows.astype(anchor_rows.dtype),
        d_anchor_all.astype(anchor_all.dtype),
        d_other.astype(other_all.dtype),
        jnp.zeros_like(off),  # fp32 offset: no gradient
        ds,
        jnp.zeros_like(ki),  # 0/1 prune masks: no gradient
        jnp.zeros_like(ka),
    )


_fused_lse_rows.defvjp(_fused_lse_rows_fwd, _fused_lse_rows_bwd)


def rows_supported(b_local: int, b_global: int, d: int) -> bool:
    return (
        _pick_tiles(b_local, d) is not None
        and _pick_tiles(b_global, d) is not None
    )


def fused_lse_rows(
    anchor_rows: jax.Array,
    anchor_all: jax.Array,
    other_all: jax.Array,
    row_offset: jax.Array,
    *,
    temperature=0.03,
    negative_weight: float = 0.8,
    interpret: bool = False,
    precision: str | None = None,
    tiles: tuple[int, int] | None = None,
    keep_inter: jax.Array | None = None,
    keep_intra: jax.Array | None = None,
) -> jax.Array:
    """Per-row logsumexp of the global-candidate CrossCLR direction.

    ``anchor_rows``: [b_loc, D] normalized local anchors; ``anchor_all`` /
    ``other_all``: [B, D] normalized gathered features; ``row_offset``:
    traced scalar — global index of local row 0.  ``temperature`` may be a
    Python float (static) or a traced scalar (learnable).  Returns
    [b_loc, 1] fp32.  Differentiable w.r.t. all three feature arrays AND
    the temperature (exact, via the rematerializing backward kernels).

    ``keep_inter`` / ``keep_intra`` (both or neither): [B] bool masks for
    the FULL-CrossCLR pruned variant — False columns are excluded (−inf
    semantics, matching functional._pruned_direction_rows: pruned
    influential negatives and the self column drop out entirely; the
    positive diagonal is always kept).  Without masks, the released-loss
    semantics apply (self column's intra logit zeroed, not dropped).
    """
    precision = _tier_name(precision)  # enum callers get string routing
    bl, d = anchor_rows.shape
    bg = anchor_all.shape[0]
    scale = 1.0 / temperature  # jnp division if temperature is traced
    tiles_r = _pick_tiles(bl, d)
    tiles_c = _pick_tiles(bg, d)
    if interpret:
        # the interpreter has no Mosaic compile-time cost, so tiny tiles
        # are fine — lets the 8-virtual-device CPU tests use small batches
        small = [t for t in (64, 32, 16, 8) if bl % t == 0]
        tiles_r = tiles_r or ((small[0], small[0]) if small else None)
        small_c = [t for t in (64, 32, 16, 8) if bg % t == 0]
        tiles_c = tiles_c or ((small_c[0], small_c[0]) if small_c else None)
    if tiles is not None:
        tb, tc = tiles
        check_explicit_tiles(tiles, bl, bg, interpret)
    else:
        if tiles_r is None or tiles_c is None:
            raise ValueError(
                f"unsupported shapes for fused rows kernel: [{bl},{d}] x [{bg},{d}]"
            )
        tb, tc = tiles_r[0], tiles_c[1]
        if precision in (None, "highest"):
            # swept at 4096 rows x 32768 candidates x d=512 (fwd+bwd,
            # scripts/sweep_global_kernel.py): (256, 1024) runs ~8% faster
            # than (512, 2048) at HIGHEST — the 3-pass fp32 dots want the
            # deeper pipeline of smaller tiles; DEFAULT prefers the wide
            # tiles' fewer grid steps (21.8 vs 24.8 ms) and keeps them
            # budget against the LANE-PADDED feature dim — the kernel
            # allocates d_pad-wide blocks, not d-wide (same
            # predicate-vs-allocation rule as _pick_tiles)
            if bl % 256 == 0 and bg % 1024 == 0 and 1024 * _lane_pad(
                max(d, 1)
            ) * 4 * 6 < 64 * 1024 * 1024:
                tb, tc = 256, 1024
    anchor_rows, anchor_all, other_all = _pad_lanes(
        anchor_rows, anchor_all, other_all
    )
    if (keep_inter is None) != (keep_intra is None):
        raise ValueError("pass both keep masks or neither")
    pruned = keep_inter is not None
    if pruned:
        ki = jnp.asarray(keep_inter, jnp.float32).reshape(1, bg)
        ka = jnp.asarray(keep_intra, jnp.float32).reshape(1, bg)
    else:
        # dummies keep the custom_vjp signature fixed; never fed to Pallas
        ki = ka = jnp.zeros((1, 1), jnp.float32)
    # fp32 scalar in SMEM: exactly represents offsets < 2^24
    off = jnp.asarray(row_offset, jnp.float32).reshape(1, 1)
    s_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    # bf16 operand fetch for the one-pass tiers happens INSIDE the vjp
    # (_fetch_cast) so feature gradients stay fp32; measured neutral on
    # the rect shapes (default 23.06 vs bf16 23.12 ms at 4096x32768) but
    # kept for the unified rule across all fused kernels
    return _fused_lse_rows(
        anchor_rows,
        anchor_all,
        other_all,
        off,
        s_arr,
        ki,
        ka,
        negative_weight,
        tb,
        tc,
        interpret,
        precision,
        pruned,
    )


def cross_clr_fused(
    video_features: jax.Array,
    text_features: jax.Array,
    video_inputs: jax.Array | None = None,
    text_inputs: jax.Array | None = None,
    *,
    temperature=0.03,
    negative_weight: float = 0.8,
    weight_temperature: float = 0.0035,
    prune_percent: float = 0.10,
    weight_norm: str = "raw",
    interpret: bool = False,
    precision: str | None = None,
) -> jax.Array:
    """Drop-in fused equivalent of ``losses.cross_clr`` (the FULL paper
    loss: influential-sample pruning + connectivity-weighted positives).

    Connectivity scoring, the pruning quantile, and the positive-weight
    softmax are plain jnp (they touch only ``[B]``/``[B, D]`` data); the
    hot ``[B, 2B]`` masked-logsumexp rows run through the pruned rect
    kernels at offset 0 (anchors == candidates), so the masked logits
    never materialize in HBM.  Falls back to ``losses.cross_clr`` when
    the shape is outside the kernels' tiling.  ``temperature`` may be a
    traced scalar (learnable); dτ is exact.
    """
    from ..losses.functional import (
        connectivity_keep_and_weights,
        connectivity_scores,
        cross_clr as _cross_clr_jnp,
        l2_normalize,
    )

    b, d = video_features.shape
    # interpret mode accepts any 8-divisible batch (small interpreter
    # tiles); compiled kernels need the real tiling
    supported = b % 8 == 0 if interpret else rows_supported(b, b, d)
    if not supported:
        return _cross_clr_jnp(
            video_features, text_features, video_inputs, text_inputs,
            temperature=temperature, negative_weight=negative_weight,
            weight_temperature=weight_temperature,
            prune_percent=prune_percent, weight_norm=weight_norm,
        )

    if video_inputs is None:
        video_inputs = video_features
    if text_inputs is None:
        text_inputs = text_features

    v = l2_normalize(video_features.astype(jnp.float32), axis=1)
    t = l2_normalize(text_features.astype(jnp.float32), axis=1)
    c_v = connectivity_scores(video_inputs)
    c_t = connectivity_scores(text_inputs)
    keep_v, w_v = connectivity_keep_and_weights(
        c_v, prune_percent=prune_percent,
        weight_temperature=weight_temperature, weight_norm=weight_norm,
    )
    keep_t, w_t = connectivity_keep_and_weights(
        c_t, prune_percent=prune_percent,
        weight_temperature=weight_temperature, weight_norm=weight_norm,
    )

    kw = dict(
        temperature=temperature,
        negative_weight=negative_weight,
        interpret=interpret,
        precision=precision,
    )
    from .fused_dual import dual_lse_pair, dual_supported

    # preferred: the dual-direction pruned kernel shares the inter-modal
    # logit tile between both directions (10 vs the two rect calls' 12
    # B²D dot units); rect row kernels remain the fallback for shapes
    # outside the dual kernel's VMEM budget
    use_dual = b % 8 == 0 if interpret else dual_supported(b, d)
    if use_dual:
        tiles = None
        if interpret and _pick_tiles(b, d) is None:
            small = max(s for s in (64, 32, 16, 8) if b % s == 0)
            tiles = (small, small)
        lse_v, lse_t = dual_lse_pair(
            v, t, keep_video=keep_v, keep_text=keep_t, tiles=tiles, **kw
        )
        lse_v, lse_t = lse_v[:, 0], lse_t[:, 0]
    else:
        off = jnp.zeros((), jnp.float32)
        # video anchors: inter columns are text samples (pruned by
        # keep_t), intra columns are video samples (keep_v); symmetric
        lse_v = fused_lse_rows(v, v, t, off, keep_inter=keep_t,
                               keep_intra=keep_v, **kw)[:, 0]
        lse_t = fused_lse_rows(t, t, v, off, keep_inter=keep_v,
                               keep_intra=keep_t, **kw)[:, 0]
    pos = jnp.sum(v * t, axis=1) / temperature
    loss_v = lse_v - pos
    loss_t = lse_t - pos
    return (jnp.mean(w_v * loss_v) + jnp.mean(w_t * loss_t)) / 2
