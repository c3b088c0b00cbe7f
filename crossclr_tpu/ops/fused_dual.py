"""Dual-direction fused Pallas kernel for the CrossCLR-intra loss pair.

The round-1 kernels (fused_crossclr.py) run one ``pallas_call`` per loss
direction, so the inter-modal logits ``s·V·Tᵀ`` are computed twice — once
as ``z_vt`` for the video direction and once (transposed) as ``z_tv`` for
the text direction.  The reference itself does the same redundant work
(loss.py:83-84 issues two separate matmuls for ``logits_per_vid`` and
``logits_per_text``).  This module fuses BOTH directions into one kernel
pair that shares the inter-modal tile:

Forward — at tile ``(i, j)`` three dots instead of four:
  * ``z_vt = s·V_i·T_jᵀ`` feeds the video direction's row-wise online
    logsumexp AND the text direction's inter-modal part column-wise
    (column ``c`` of ``z_vt`` holds anchor ``t_{j+c}``'s logits against
    the ``V_i`` rows).
  * ``z_vv``/``z_tt`` feed each direction's intra part row-wise (with the
    reference's zeroed-diagonal quirk, loss.py:95-97).
  The text direction's lse comes out split as (inter, intra) partial
  logsumexps combined outside with one stable ``logaddexp`` — exact.

Backward — seven dots instead of eight, because the shared matrix
``M = diag(g_v)·P + (diag(g_t)·R)ᵀ`` (with ``P``/``R`` the two
directions' inter-modal softmax rows) serves both feature gradients:
``dV_i += M·T_j`` and ``dT_j += Mᵀ·V_i`` (the transpose is a free
``dot_general`` dim-0 contraction, never a relayout).  The intra blocks
``q_v``/``q_t`` fold each direction's row- and column-roles exactly as the
single-direction kernel did.

Temperature is TRACED: ``scale = 1/τ`` arrives as an SMEM ``(1,1)`` scalar
(same pattern as fused_global.py's row offset), so one compiled kernel
serves any temperature and CLIP-style learnable temperature composes with
the fused path.  The backward additionally returns ``d loss/d scale``
(accumulated as ``Σ M⊙z_vt + q_v⊙z_vv + q_t⊙z_tt`` over tiles, divided by
``scale`` outside), so ``jax.grad`` w.r.t. a live temperature is exact.

Numerics: with a *static* temperature whose scale is safely below the
fp32 exp overflow point, the backward uses the factored single-exp form
``exp(z)·(g·e^{−lse})`` (see fused_crossclr.py); a traced temperature can
reach ``s≈3333`` under the CLIP bound, so that path uses the subtract-first
form — one extra exp per block, still fewer than two kernel launches.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_crossclr import (
    _LANE,
    _NEG_INF,
    _dot,
    _dot_nt,
    _fetch_cast,
    _lane_block_ok,
    _lane_pad,
    _pad_lanes,
    _pick_tiles,
    _resolve_precision,
    _tier_name,
    check_explicit_tiles,
)

# the PRUNED (full-CrossCLR) variant's "excluded candidate" logit —
# single source in fused_global (see its comment for the −1e9 choice and
# the fully-masked-tile online-max rescue)
from .fused_global import _MASKED

__all__ = ["dual_lse_pair", "dual_supported", "sym_supported"]

# the backward keeps a [B, D] fp32 accumulator for the column-indexed text
# gradient in VMEM; cap it so tiles + accumulator stay within the budget.
# Budgets use the LANE-PADDED feature dim — what the kernels allocate.
_MAX_COL_ACC_BYTES = 48 * 1024 * 1024


def dual_supported(b: int, d: int) -> bool:
    return (
        _pick_tiles(b, d) is not None
        and b * _lane_pad(max(d, 1)) * 4 <= _MAX_COL_ACC_BYTES
    )


def _coeff_safe(b: int, scale: float, neg_weight: float) -> bool:
    """Gate for the factored backward forms (sym kernels and the dual
    kernels' ``factored`` fast path), which compute ``exp(z)`` and
    ``exp(-lse)`` as separate factors.  ``exp(z)`` stays finite for
    scale <= 80, but ``lse`` can reach ``m0 + log(2B+1)`` (every
    candidate at the bound plus the zeroed-diagonal +1), and TPU flushes
    subnormals: ``exp(-x)`` for x beyond ~87 becomes exactly 0, silently
    zeroing that row's entire gradient.  Require the worst-case exponent
    to stay in normal fp32 range with margin; callers fall back to the
    subtract-first online-max kernels (which compute exp(z - lse) >=
    1/(2B+1) directly) when this fails."""
    m0 = max(scale, neg_weight * scale, 0.0)
    return m0 + math.log(2 * b + 1) <= 85.0


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _dual_fwd_kernel(
    *refs,
    neg_weight: float,
    tb: int,
    tc: int,
    precision,
    pruned: bool,
):
    if pruned:
        (s_ref, kv_row_ref, kv_col_ref, kt_col_ref,
         v_row_ref, t_row_ref, t_col_ref, v_col_ref,
         lse_v_ref, lse_ti_ref, lse_tc_ref,
         m_v, l_v, m_ti, l_ti, m_tc, l_tc) = refs
    else:
        (s_ref, v_row_ref, t_row_ref, t_col_ref, v_col_ref,
         lse_v_ref, lse_ti_ref, lse_tc_ref,
         m_v, l_v, m_ti, l_ti, m_tc, l_tc) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    scale = s_ref[0, 0]

    @pl.when(j == 0)
    def _init_rows():
        m_v[:] = jnp.full_like(m_v[:], _NEG_INF)
        l_v[:] = jnp.zeros_like(l_v[:])
        m_ti[:] = jnp.full_like(m_ti[:], _NEG_INF)
        l_ti[:] = jnp.zeros_like(l_ti[:])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_cols():
        m_tc[:] = jnp.full_like(m_tc[:], _NEG_INF)
        l_tc[:] = jnp.zeros_like(l_tc[:])

    v_i = v_row_ref[:]
    t_i = t_row_ref[:]
    t_j = t_col_ref[:]
    v_j = v_col_ref[:]

    z_vt = scale * _dot_nt(v_i, t_j, precision)  # [TB, TC]
    z_vv = (neg_weight * scale) * _dot_nt(v_i, v_j, precision)
    z_tt = (neg_weight * scale) * _dot_nt(t_i, t_j, precision)

    rows = i * tb + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
    cols = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 1)
    on_diag = rows == cols
    if pruned:
        # full-CrossCLR: pruned negatives / self column DROPPED (−1e9),
        # positive diagonal always kept.  The shared z_vt tile carries
        # DIFFERENT masks per direction — each anchor prunes candidates by
        # the CANDIDATE modality's keep mask: video anchors (row-lse) by
        # keep_t over columns, text anchors (col-lse) by keep_v over rows.
        keep_t_col = kt_col_ref[:] > 0.5  # [1, TC]
        keep_v_col = kv_col_ref[:] > 0.5
        keep_v_row = kv_row_ref[:] > 0.5  # [TB, 1]
        zA_vt = jnp.where(keep_t_col | on_diag, z_vt, _MASKED)
        zB_vt = jnp.where(keep_v_row | on_diag, z_vt, _MASKED)
        z_vv = jnp.where(keep_v_col & ~on_diag, z_vv, _MASKED)
        z_tt = jnp.where(keep_t_col & ~on_diag, z_tt, _MASKED)
    else:
        # parity quirk: the self-similarity logit is ZEROED, not dropped
        zA_vt = zB_vt = z_vt
        z_vv = jnp.where(on_diag, 0.0, z_vv)
        z_tt = jnp.where(on_diag, 0.0, z_tt)

    # video direction: row-wise online lse over {zA_vt ‖ z_vv}
    m_prev = m_v[:]
    m_new = jnp.maximum(
        m_prev,
        jnp.maximum(
            jnp.max(zA_vt, axis=1, keepdims=True),
            jnp.max(z_vv, axis=1, keepdims=True),
        ),
    )
    l_new = (
        l_v[:] * jnp.exp(m_prev - m_new)
        + jnp.sum(jnp.exp(zA_vt - m_new), axis=1, keepdims=True)
        + jnp.sum(jnp.exp(z_vv - m_new), axis=1, keepdims=True)
    )
    m_v[:] = m_new
    l_v[:] = l_new

    @pl.when(j == nj - 1)
    def _fin_v():
        lse_v_ref[:] = m_new + jnp.log(l_new)

    # text direction, intra part: row-wise online lse over z_tt
    mt_prev = m_ti[:]
    mt_new = jnp.maximum(mt_prev, jnp.max(z_tt, axis=1, keepdims=True))
    lt_new = l_ti[:] * jnp.exp(mt_prev - mt_new) + jnp.sum(
        jnp.exp(z_tt - mt_new), axis=1, keepdims=True
    )
    m_ti[:] = mt_new
    l_ti[:] = lt_new

    @pl.when(j == nj - 1)
    def _fin_ti():
        lse_ti_ref[:] = mt_new + jnp.log(lt_new)

    # text direction, inter part: COLUMN-wise online lse over the shared
    # z_vt tile (column c = anchor t_{j+c} vs the V_i rows), accumulated
    # across the outer i loop in per-column-block scratch
    mc_prev = m_tc[j]  # [1, TC]
    mc_new = jnp.maximum(mc_prev, jnp.max(zB_vt, axis=0, keepdims=True))
    lc_new = l_tc[j] * jnp.exp(mc_prev - mc_new) + jnp.sum(
        jnp.exp(zB_vt - mc_new), axis=0, keepdims=True
    )
    m_tc[j] = mc_new
    l_tc[j] = lc_new

    @pl.when(i == ni - 1)
    def _fin_tc():
        lse_tc_ref[:] = mc_new + jnp.log(lc_new)


def _dual_fwd(
    v_norm, t_norm, scale_arr, kv, kt, neg_weight, tb, tc, interpret,
    precision, pruned
):
    v_norm, t_norm = _fetch_cast(precision, v_norm, t_norm)
    b, d = v_norm.shape
    ni, nj = b // tb, b // tc
    kernel = functools.partial(
        _dual_fwd_kernel,
        neg_weight=neg_weight,
        tb=tb,
        tc=tc,
        precision=_resolve_precision(precision),
        pruned=pruned,
    )
    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    mask_specs = (
        [
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),  # kv rows
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ]
        if pruned
        else []
    )
    mask_args = (
        (kv.reshape(b, 1), kv.reshape(1, b), kt.reshape(1, b))
        if pruned
        else ()
    )
    lse_v, lse_ti, lse_tc = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            *mask_specs,
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), col, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((tb, 1), jnp.float32),
            pltpu.VMEM((nj, 1, tc), jnp.float32),
            pltpu.VMEM((nj, 1, tc), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scale_arr, *mask_args, v_norm, t_norm, t_norm, v_norm)
    # exact: lse over the union of two candidate blocks = stable logaddexp
    # of the per-block logsumexps
    lse_t = jnp.logaddexp(lse_tc.reshape(b, 1), lse_ti)
    return lse_v, lse_t


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dual_bwd_kernel(
    *refs,
    neg_weight: float,
    tb: int,
    tc: int,
    precision,
    factored: bool,
    pruned: bool,
):
    if pruned:
        (s_ref, kv_row_ref, kt_row_ref, kv_col_ref, kt_col_ref,
         v_row_ref, t_row_ref, lse_v_row_ref, lse_t_row_ref,
         gv_row_ref, gt_row_ref, t_col_ref, v_col_ref,
         lse_v_colT_ref, lse_t_colT_ref, gv_colT_ref, gt_colT_ref,
         dv_ref, dt_row_out_ref, dt_col_out_ref, ds_ref,
         dv_scr, dt_row_scr, dt_col_scr, ds_scr) = refs
    else:
        (s_ref,
         v_row_ref, t_row_ref, lse_v_row_ref, lse_t_row_ref,
         gv_row_ref, gt_row_ref, t_col_ref, v_col_ref,
         lse_v_colT_ref, lse_t_colT_ref, gv_colT_ref, gt_colT_ref,
         dv_ref, dt_row_out_ref, dt_col_out_ref, ds_ref,
         dv_scr, dt_row_scr, dt_col_scr, ds_scr) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    scale = s_ref[0, 0]

    @pl.when(j == 0)
    def _init_rows():
        dv_scr[:] = jnp.zeros_like(dv_scr[:])
        dt_row_scr[:] = jnp.zeros_like(dt_row_scr[:])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_cols():
        dt_col_scr[:] = jnp.zeros_like(dt_col_scr[:])
        ds_scr[0, 0] = 0.0

    v_i = v_row_ref[:]  # [TB, D]
    t_i = t_row_ref[:]
    t_j = t_col_ref[:]  # [TC, D]
    v_j = v_col_ref[:]
    lse_v_i = lse_v_row_ref[:]  # [TB, 1]
    lse_t_i = lse_t_row_ref[:]
    gv_i = gv_row_ref[:]
    gt_i = gt_row_ref[:]
    # column-side factors arrive PRE-TRANSPOSED as (1, B) lane vectors: an
    # in-kernel sublane->lane relayout is a measured ~10x kernel slowdown
    lse_v_j = lse_v_colT_ref[:]  # [1, TC]
    lse_t_j = lse_t_colT_ref[:]
    gv_j = gv_colT_ref[:]
    gt_j = gt_colT_ref[:]

    def two_softmax(z, g_row, lse_row, g_col, lse_col):
        # g_row·exp(z − lse_row) + g_col·exp(z − lse_col), optionally
        # factored through a single exp(z) when |z| is statically bounded
        # below the fp32 overflow point (see fused_crossclr.py)
        if factored:
            return jnp.exp(z) * (
                g_row * jnp.exp(-lse_row) + g_col * jnp.exp(-lse_col)
            )
        return g_row * jnp.exp(z - lse_row) + g_col * jnp.exp(z - lse_col)

    rows = i * tb + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 0)
    cols = j * tc + jax.lax.broadcasted_iota(jnp.int32, (tb, tc), 1)
    on_diag = rows == cols

    if pruned:
        # Pruned (full-CrossCLR) masks are ROLE-ASYMMETRIC: the same
        # logit value z[r, c] is masked by the CANDIDATE's keep when the
        # row is the anchor and by the ROW's keep when the column is the
        # anchor, so each tile carries TWO masked COEFFICIENT variants
        # (A = row-role, B = column-role).  Since r5 the masks zero the
        # coefficients multiplicatively (exactly like the sym kernels)
        # instead of rewriting logits to −1e9: the raw z tile serves both
        # roles' exps and the dτ products directly (a masked part is
        # exactly 0, and 0·z_finite = 0), which drops six live [TB, TC]
        # masked-logit temporaries from the tile loop.  Both roles'
        # coefficients still sum into one matrix for the feature dots
        # (∂z/∂feature is identical for both roles).
        keep_v_row = kv_row_ref[:] > 0.5  # [TB, 1]
        keep_t_row = kt_row_ref[:] > 0.5
        keep_v_col = kv_col_ref[:] > 0.5  # [1, TC]
        keep_t_col = kt_col_ref[:] > 0.5

        z_vt = scale * _dot_nt(v_i, t_j, precision)
        mA = jnp.where(
            keep_t_col | on_diag, gv_i * jnp.exp(z_vt - lse_v_i), 0.0
        )
        mB = jnp.where(
            keep_v_row | on_diag, gt_j * jnp.exp(z_vt - lse_t_j), 0.0
        )
        m = mA + mB
        dv_acc = _dot(m, t_j, precision)
        dt_col_scr[j] = dt_col_scr[j] + jax.lax.dot_general(
            m, v_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds_inter = jnp.sum(m * z_vt)

        z_vv = (neg_weight * scale) * _dot_nt(v_i, v_j, precision)
        q_v = (
            jnp.where(keep_v_col & ~on_diag,
                      gv_i * jnp.exp(z_vv - lse_v_i), 0.0)
            + jnp.where(keep_v_row & ~on_diag,
                        gv_j * jnp.exp(z_vv - lse_v_j), 0.0)
        )
        dv_acc = dv_acc + neg_weight * _dot(q_v, v_j, precision)
        dv_scr[:] = dv_scr[:] + dv_acc
        ds_intra = jnp.sum(q_v * z_vv)

        z_tt = (neg_weight * scale) * _dot_nt(t_i, t_j, precision)
        q_t = (
            jnp.where(keep_t_col & ~on_diag,
                      gt_i * jnp.exp(z_tt - lse_t_i), 0.0)
            + jnp.where(keep_t_row & ~on_diag,
                        gt_j * jnp.exp(z_tt - lse_t_j), 0.0)
        )
        dt_row_scr[:] = dt_row_scr[:] + neg_weight * _dot(
            q_t, t_j, precision
        )

        # dτ: inter parts belong to different loss directions (once each);
        # the A/B intra sweeps each cover every (anchor, candidate) pair
        # exactly once more — halving counts each once
        ds_scr[0, 0] = ds_scr[0, 0] + (
            ds_inter + 0.5 * (ds_intra + jnp.sum(q_t * z_tt))
        )
    else:
        # ---- shared inter-modal tile: one logit dot, both gradients
        z_vt = scale * _dot_nt(v_i, t_j, precision)
        m = two_softmax(z_vt, gv_i, lse_v_i, gt_j, lse_t_j)
        dv_acc = _dot(m, t_j, precision)
        # dTⱼ += Mᵀ·Vᵢ as a dim-0 contraction — no transpose materializes
        dt_col_scr[j] = dt_col_scr[j] + jax.lax.dot_general(
            m,
            v_i,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        )

        # ---- video intra tile
        z_vv = (neg_weight * scale) * _dot_nt(v_i, v_j, precision)
        q_v = two_softmax(z_vv, gv_i, lse_v_i, gv_j, lse_v_j)
        q_v = jnp.where(on_diag, 0.0, q_v)  # zeroed logit ⇒ constant ⇒ no grad
        dv_acc = dv_acc + neg_weight * _dot(q_v, v_j, precision)
        dv_scr[:] = dv_scr[:] + dv_acc

        # ---- text intra tile
        z_tt = (neg_weight * scale) * _dot_nt(t_i, t_j, precision)
        q_t = two_softmax(z_tt, gt_i, lse_t_i, gt_j, lse_t_j)
        q_t = jnp.where(on_diag, 0.0, q_t)
        dt_row_scr[:] = dt_row_scr[:] + neg_weight * _dot(q_t, t_j, precision)

        # ---- temperature gradient: Σ coeff⊙z over all logits (÷ scale
        # outside).  q_v/q_t fold the row- AND column-role coefficients of
        # the same symmetric intra logit (needed for the feature gradient),
        # so each intra logit appears twice in q⊙z — halve those sums.  m's
        # two factors belong to DIFFERENT loss directions, each counted once.
        ds_scr[0, 0] = ds_scr[0, 0] + (
            jnp.sum(m * z_vt)
            + 0.5 * (jnp.sum(q_v * z_vv) + jnp.sum(q_t * z_tt))
        )

    @pl.when(j == nj - 1)
    def _fin_rows():
        dv_ref[:] = scale * dv_scr[:]
        dt_row_out_ref[:] = scale * dt_row_scr[:]

    @pl.when(i == ni - 1)
    def _fin_cols():
        dt_col_out_ref[:] = scale * dt_col_scr[j]

    @pl.when(jnp.logical_and(i == ni - 1, j == nj - 1))
    def _fin_ds():
        ds_ref[0, 0] = ds_scr[0, 0]


def _dual_bwd(
    v_norm,
    t_norm,
    scale_arr,
    kv,
    kt,
    lse_v,
    lse_t,
    g_v,
    g_t,
    neg_weight,
    tb,
    tc,
    interpret,
    precision,
    factored,
    pruned,
):
    v_norm, t_norm = _fetch_cast(precision, v_norm, t_norm)
    b, d = v_norm.shape
    ni, nj = b // tb, b // tc
    kernel = functools.partial(
        _dual_bwd_kernel,
        neg_weight=neg_weight,
        tb=tb,
        tc=tc,
        precision=_resolve_precision(precision),
        factored=factored,
        pruned=pruned,
    )
    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    colT = lambda i, j: (0, j)  # noqa: E731
    smem = lambda i, j: (0, 0)  # noqa: E731
    lse_v_t = lse_v.reshape(1, b)
    lse_t_t = lse_t.reshape(1, b)
    g_v_t = g_v.reshape(1, b)
    g_t_t = g_t.reshape(1, b)
    mask_specs = (
        [
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),  # kv rows
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),  # kt rows
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),  # kv cols
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),  # kt cols
        ]
        if pruned
        else []
    )
    mask_args = (
        (
            kv.reshape(b, 1),
            kt.reshape(b, 1),
            kv.reshape(1, b),
            kt.reshape(1, b),
        )
        if pruned
        else ()
    )
    dv, dt_row, dt_col, ds = pl.pallas_call(
        kernel,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((1, 1), smem, memory_space=pltpu.SMEM),
            *mask_specs,
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), colT, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), smem, memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tb, d), jnp.float32),
            pltpu.VMEM((tb, d), jnp.float32),
            pltpu.VMEM((nj, tc, d), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        scale_arr,
        *mask_args,
        v_norm,
        t_norm,
        lse_v,
        lse_t,
        g_v,
        g_t,
        t_norm,
        v_norm,
        lse_v_t,
        lse_t_t,
        g_v_t,
        g_t_t,
    )
    return dv, dt_row + dt_col, ds


# ---------------------------------------------------------------------------
# custom VJP (scale is DIFFERENTIABLE — learnable temperature support)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _dual_lse_pair(
    v_norm,
    t_norm,
    scale_arr,
    kv,
    kt,
    neg_weight: float,
    tb: int,
    tc: int,
    interpret: bool,
    precision: str | None,
    factored: bool,
    pruned: bool,
):
    return _dual_fwd(
        v_norm, t_norm, scale_arr, kv, kt, neg_weight, tb, tc, interpret,
        precision, pruned,
    )


def _dual_lse_pair_fwd(
    v_norm, t_norm, scale_arr, kv, kt, neg_weight, tb, tc, interpret,
    precision, factored, pruned,
):
    lse_v, lse_t = _dual_fwd(
        v_norm, t_norm, scale_arr, kv, kt, neg_weight, tb, tc, interpret,
        precision, pruned,
    )
    return (lse_v, lse_t), (v_norm, t_norm, scale_arr, kv, kt, lse_v, lse_t)


def _dual_lse_pair_bwd(
    neg_weight, tb, tc, interpret, precision, factored, pruned,
    residuals, cotangents,
):
    v_norm, t_norm, scale_arr, kv, kt, lse_v, lse_t = residuals
    g_v, g_t = cotangents
    g_v = jnp.asarray(g_v, jnp.float32).reshape(-1, 1)
    g_t = jnp.asarray(g_t, jnp.float32).reshape(-1, 1)
    dv, dt, ds_raw = _dual_bwd(
        v_norm, t_norm, scale_arr, kv, kt, lse_v, lse_t, g_v, g_t,
        neg_weight, tb, tc, interpret, precision, factored, pruned,
    )
    # kernel accumulates Σ coeff⊙z = scale · dL/dscale
    ds = (ds_raw / scale_arr[0, 0]).reshape(scale_arr.shape)
    return (
        dv.astype(v_norm.dtype),
        dt.astype(t_norm.dtype),
        ds,
        jnp.zeros_like(kv),  # 0/1 keep masks: no gradient
        jnp.zeros_like(kt),
    )


_dual_lse_pair.defvjp(_dual_lse_pair_fwd, _dual_lse_pair_bwd)


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------


def dual_lse_pair(
    v_norm: jax.Array,
    t_norm: jax.Array,
    *,
    temperature,
    negative_weight: float = 0.8,
    interpret: bool = False,
    precision: str | None = None,
    tiles: tuple[int, int] | None = None,
    keep_video: jax.Array | None = None,
    keep_text: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Both directions' ``[B, 1]`` logsumexps in one fused pass.

    ``temperature`` may be a Python float (static) or a traced scalar
    (learnable); gradients flow to features AND temperature.  Inputs must
    be L2-normalized.  Caller must check :func:`dual_supported` (or pass
    ``interpret=True`` with manual ``tiles``).

    ``keep_video`` / ``keep_text`` (both or neither): ``[B]`` bool keep
    masks for the FULL-CrossCLR pruned variant — each anchor's negatives
    are pruned by the CANDIDATE modality's mask, the self column is
    dropped (−inf semantics, not the released loss's zeroing quirk), and
    the positive diagonal is always kept.  Matches
    functional._pruned_direction_rows on both directions.
    """
    precision = _tier_name(precision)  # enum callers get string routing
    b, d = v_norm.shape
    if (keep_video is None) != (keep_text is None):
        raise ValueError("pass both keep masks or neither")
    pruned = keep_video is not None
    static_temp = isinstance(temperature, (int, float))
    if static_temp:
        scale = 1.0 / float(temperature)
        w_scale = negative_weight * scale
        factored = (
            not pruned
            and 0.0 < scale < 80.0
            and 0.0 <= w_scale < 80.0
            and _coeff_safe(b, scale, negative_weight)  # exp(-lse) FTZ
        )
    else:
        scale = 1.0 / temperature
        factored = False  # CLIP-bounded τ can reach s≈3333: exp(z) unsafe
    explicit_tiles = tiles is not None
    if tiles is None:
        tiles = _pick_tiles(b, d)
        if tiles is None:
            raise ValueError(f"unsupported shape [{b},{d}] for dual kernel")
        if pruned and precision != "highest":
            # re-measured after the r5 backward refactor (masks fold into
            # the coefficients — the six live [TB, TC] masked-logit tiles
            # that once blew scoped VMEM at (512, 2048)/d=512 are gone):
            # both row tiles now compile; 4096×512 traced-τ chained scan
            # times 256 ≈ 512 at `default` (1.602 vs 1.616 ms/step, keep
            # the smaller pipeline) while `highest`'s 3-pass dots prefer
            # the full row tile (6.407 vs 6.664 ms — fewer grid steps
            # amortize the pass overhead), so only non-highest halves
            tiles = (min(tiles[0], 256), tiles[1])
    tb, tc = tiles
    # symmetric static-max kernels win at HIGHEST (the 15% dot cut is
    # the bottleneck there: measured 8.6 vs 10.1 ms interleaved) AND —
    # with bf16 operand fetch — at DEFAULT: the r3 chained-scan sweep
    # measured sym beating the online-max kernels at every shipped shape
    # (4096×512: 1.279 vs 1.406 ms; 1024×512: 0.366 vs 0.495;
    # 8192×512: 4.159 vs 4.830; 4096×256/384/1024: −14/−10/−12%), so
    # every static-temperature unpruned tier routes here.  The PRUNED
    # (full-CrossCLR) variant routes here too since r5: the folded
    # coefficient matrix stays symmetric under the role-asymmetric keep
    # masks (see the sym section comment), so triangle sharing holds;
    # masks cost only VPU multiplies.  Gated by the tighter 2·m0 ≤ 80
    # bound (the pruned row sums have no exp(−m0) diagonal floor — only
    # the positive at exp(−(s+m0))); traced τ and out-of-budget shapes
    # keep the online-max dual kernels.
    use_sym = (
        static_temp
        and not explicit_tiles  # sweeps pin the online-max kernels
        and precision in (None, "highest", "default", "bf16")
        and sym_supported(b, d, scale, negative_weight, pruned=pruned)
    )
    # auto-picked tiles satisfy both rules by construction; this guards
    # explicit (sweep) tiles — divisibility AND the Mosaic lane-vector
    # rule (validator shared with every other kernel entry point)
    check_explicit_tiles((tb, tc), b, b, interpret)
    v_norm, t_norm = _pad_lanes(v_norm, t_norm)
    # bf16 operand fetch for the one-pass tiers happens INSIDE the vjp
    # boundary (_fetch_cast in the fwd/bwd wrappers): it is value-identical
    # on TPU (DEFAULT dots round operands to bf16 in the MXU anyway) and
    # halves operand HBM traffic — measured +7% (dual) / +13% (sym) at
    # 4096×512 — while the feature GRADIENTS still leave in fp32.
    if pruned:
        kv = jnp.asarray(keep_video, jnp.float32).reshape(b)
        kt = jnp.asarray(keep_text, jnp.float32).reshape(b)
    else:
        # dummies keep the custom_vjp signature fixed; never fed to Pallas
        kv = kt = jnp.zeros((1,), jnp.float32)
    if use_sym:
        return _sym_lse_pair(
            v_norm,
            t_norm,
            kv,
            kt,
            float(scale),
            negative_weight,
            _pick_square_tile(b, d),
            interpret,
            precision,
            pruned,
        )
    scale_arr = jnp.asarray(scale, jnp.float32).reshape(1, 1)
    return _dual_lse_pair(
        v_norm,
        t_norm,
        scale_arr,
        kv,
        kt,
        negative_weight,
        tb,
        tc,
        interpret,
        precision,
        factored,
        pruned,
    )


# ---------------------------------------------------------------------------
# symmetric static-max variant (static temperature fast path)
#
# With L2-normalized inputs and a STATIC temperature, every logit is
# bounded: |z_inter| <= s = 1/τ and |z_intra| <= w·s (the zeroed diagonal
# contributes exactly 0).  Shifting by the constant m0 = max(s, w·s, 0)
# makes exp(z − m0) overflow-free with no running max, no rescaling, and
# partial sums that ADD across tiles — so
#   * one exp of the shared inter tile serves BOTH directions (row sums
#     for the video lse, column sums for the text lse), and
#   * the symmetric intra matrices V·Vᵀ / T·Tᵀ are computed only on the
#     lower-triangle tiles (square tiles; row sums serve the row block,
#     column sums of the same tile serve the column block).
# Forward drops from 3 to ~2.1 B²D dot units and sheds all online-softmax
# VPU bookkeeping; the backward recomputes intra logits only on the
# triangle (7 → ~6.4 units).  Underflow: the sums always contain the
# zeroed-diagonal term exp(−m0) ≥ e^-85 > fp32 tiny, so log() stays
# finite; the wrapper gates this path to s ≤ 80 (τ ≥ 0.0125) and routes
# smaller temperatures (and traced ones) to the online-max kernels above.
#
# PRUNED (full-CrossCLR) variant: the r4 routing note claimed the
# role-asymmetric keep masks break the triangle sharing — they don't.
# The folded coefficient matrix stays SYMMETRIC under pruning
# (C[r,c] = g_r·e^{z−lse_r}·[keep_c] + g_c·e^{z−lse_c}·[keep_r] equals its
# transpose because z is), so the same one-dot-per-tile schedule carries
# over; masks enter as multiplicative 0/1 VPU factors on the exp values
# (NOT −1e9 logits — no max bookkeeping exists here to absorb them), at
# the cost of keeping TWO masked exp variants per intra tile (row-role vs
# column-role sums).  Dropped candidates contribute exactly 0, identical
# to the −inf semantics of functional._pruned_direction_rows.  Underflow:
# the always-kept positive bounds every row sum below by
# exp(z_pos − m0) ≥ exp(−(s + m0)) ≥ exp(−2·m0), so the wrapper gates the
# pruned route to 2·m0 ≤ 80 — every exp argument then lives in [−80, 0]
# and nothing flushes (fp32 flush point ≈ e^−87.3).
# ---------------------------------------------------------------------------


def _sym_fwd_kernel(
    *refs,
    scale: float,
    neg_weight: float,
    ts: int,
    precision,
    pruned: bool,
):
    if pruned:
        (kv_row_ref, kt_row_ref, kv_col_ref, kt_col_ref,
         v_row_ref, t_row_ref, t_col_ref, v_col_ref,
         lv_row_ref, lt_row_ref, lv_col_ref, lt_col_ref,
         lv_row_scr, lt_row_scr, lv_col_scr, lt_col_scr) = refs
    else:
        (v_row_ref, t_row_ref, t_col_ref, v_col_ref,
         lv_row_ref, lt_row_ref, lv_col_ref, lt_col_ref,
         lv_row_scr, lt_row_scr, lv_col_scr, lt_col_scr) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    m0 = max(scale, neg_weight * scale, 0.0)

    @pl.when(j == 0)
    def _init_rows():
        lv_row_scr[:] = jnp.zeros_like(lv_row_scr[:])
        lt_row_scr[:] = jnp.zeros_like(lt_row_scr[:])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_cols():
        lv_col_scr[:] = jnp.zeros_like(lv_col_scr[:])
        lt_col_scr[:] = jnp.zeros_like(lt_col_scr[:])

    v_i = v_row_ref[:]
    t_j = t_col_ref[:]
    rows = i * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 0)
    cols = j * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 1)
    on_diag = rows == cols
    if pruned:
        keep_v_row = kv_row_ref[:] > 0.5  # [TS, 1]
        keep_t_row = kt_row_ref[:] > 0.5
        keep_v_col = kv_col_ref[:] > 0.5  # [1, TS]
        keep_t_col = kt_col_ref[:] > 0.5

    # shared inter tile: one dot + one exp feeds both directions
    z_vt = scale * _dot_nt(v_i, t_j, precision)
    e_vt = jnp.exp(z_vt - m0)
    if pruned:
        # row role (video anchors): candidates pruned by keep_t, positive
        # diagonal always kept; column role (text anchors): by keep_v
        lv_row = jnp.sum(
            jnp.where(keep_t_col | on_diag, e_vt, 0.0), axis=1, keepdims=True
        )
        lt_col_scr[j] = lt_col_scr[j] + jnp.sum(
            jnp.where(keep_v_row | on_diag, e_vt, 0.0), axis=0, keepdims=True
        )
    else:
        lv_row = jnp.sum(e_vt, axis=1, keepdims=True)
        lt_col_scr[j] = lt_col_scr[j] + jnp.sum(e_vt, axis=0, keepdims=True)

    # intra tiles only on the lower triangle (z symmetric): row sums for
    # block i, column sums of the SAME tile for block j (strictly below
    # the diagonal tile — the diagonal tile's row sweep already covers
    # its full symmetric block)
    @pl.when(j <= i)
    def _intra():
        t_i = t_row_ref[:]
        v_j = v_col_ref[:]
        z_vv = (neg_weight * scale) * _dot_nt(v_i, v_j, precision)
        z_tt = (neg_weight * scale) * _dot_nt(t_i, t_j, precision)
        if pruned:
            # self column DROPPED (mask), influential columns pruned; the
            # same exp serves both roles with role-specific masks
            e_vv = jnp.exp(z_vv - m0)
            e_tt = jnp.exp(z_tt - m0)
            eA_vv = jnp.where(keep_v_col & ~on_diag, e_vv, 0.0)
            eA_tt = jnp.where(keep_t_col & ~on_diag, e_tt, 0.0)
        else:
            z_vv = jnp.where(on_diag, 0.0, z_vv)  # parity quirk: zeroed
            e_vv = jnp.exp(z_vv - m0)
            z_tt = jnp.where(on_diag, 0.0, z_tt)
            e_tt = jnp.exp(z_tt - m0)
            eA_vv, eA_tt = e_vv, e_tt
        lv_row_scr[:] = lv_row_scr[:] + jnp.sum(eA_vv, axis=1, keepdims=True)
        lt_row_scr[:] = lt_row_scr[:] + jnp.sum(eA_tt, axis=1, keepdims=True)

        @pl.when(j < i)
        def _cols():
            if pruned:
                # column role: the transposed (upper-triangle) tile's
                # anchors are this tile's COLUMNS — candidates are its
                # rows, so the keep masks apply on the row axis
                eB_vv = jnp.where(keep_v_row & ~on_diag, e_vv, 0.0)
                eB_tt = jnp.where(keep_t_row & ~on_diag, e_tt, 0.0)
            else:
                eB_vv, eB_tt = e_vv, e_tt
            lv_col_scr[j] = lv_col_scr[j] + jnp.sum(
                eB_vv, axis=0, keepdims=True
            )
            lt_col_scr[j] = lt_col_scr[j] + jnp.sum(
                eB_tt, axis=0, keepdims=True
            )

    lv_row_scr[:] = lv_row_scr[:] + lv_row

    @pl.when(j == nj - 1)
    def _fin_rows():
        lv_row_ref[:] = lv_row_scr[:]
        lt_row_ref[:] = lt_row_scr[:]

    @pl.when(i == ni - 1)
    def _fin_cols():
        lv_col_ref[:] = lv_col_scr[j]
        lt_col_ref[:] = lt_col_scr[j]


def _sym_fwd(v_norm, t_norm, kv, kt, scale, neg_weight, ts, interpret,
             precision, pruned):
    v_norm, t_norm = _fetch_cast(precision, v_norm, t_norm)
    b, d = v_norm.shape
    n = b // ts
    kernel = functools.partial(
        _sym_fwd_kernel,
        scale=scale,
        neg_weight=neg_weight,
        ts=ts,
        precision=_resolve_precision(precision),
        pruned=pruned,
    )
    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    colT = lambda i, j: (0, j)  # noqa: E731
    # v_col feeds ONLY the lower-triangle intra tiles (the inter tile uses
    # v_row x t_col): clamping its index past the diagonal freezes the
    # window so the upper-triangle fetches — never read by the kernel
    # body — are not DMA'd at all (~half that operand's HBM traffic)
    tri = lambda i, j: (jnp.minimum(i, j), 0)  # noqa: E731
    mask_specs = (
        [
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),  # kv rows
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),  # kt rows
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),  # kv cols
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),  # kt cols
        ]
        if pruned
        else []
    )
    mask_args = (
        (kv.reshape(b, 1), kt.reshape(b, 1), kv.reshape(1, b), kt.reshape(1, b))
        if pruned
        else ()
    )
    lv_row, lt_row, lv_col, lt_col = pl.pallas_call(
        kernel,
        grid=(n, n),
        in_specs=[
            *mask_specs,
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), tri, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
            jax.ShapeDtypeStruct((1, b), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ts, 1), jnp.float32),
            pltpu.VMEM((ts, 1), jnp.float32),
            pltpu.VMEM((n, 1, ts), jnp.float32),
            pltpu.VMEM((n, 1, ts), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*mask_args, v_norm, t_norm, t_norm, v_norm)
    m0 = max(scale, neg_weight * scale, 0.0)
    lse_v = m0 + jnp.log(lv_row + lv_col.reshape(b, 1))
    lse_t = m0 + jnp.log(lt_row + lt_col.reshape(b, 1))
    return lse_v, lse_t


def _sym_bwd_kernel(
    *refs,
    scale: float,
    neg_weight: float,
    ts: int,
    precision,
    pruned: bool,
):
    if pruned:
        (kv_row_ref, kt_row_ref, kv_col_ref, kt_col_ref,
         v_row_ref, t_row_ref, lse_v_row_ref, lse_t_row_ref,
         gv_row_ref, gt_row_ref, t_col_ref, v_col_ref,
         lse_v_colT_ref, lse_t_colT_ref, gv_colT_ref, gt_colT_ref,
         dv_row_ref, dt_row_ref, dv_col_ref, dt_col_ref,
         dv_row_scr, dt_row_scr, dv_col_scr, dt_col_scr) = refs
    else:
        (v_row_ref, t_row_ref, lse_v_row_ref, lse_t_row_ref,
         gv_row_ref, gt_row_ref, t_col_ref, v_col_ref,
         lse_v_colT_ref, lse_t_colT_ref, gv_colT_ref, gt_colT_ref,
         dv_row_ref, dt_row_ref, dv_col_ref, dt_col_ref,
         dv_row_scr, dt_row_scr, dv_col_scr, dt_col_scr) = refs
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init_rows():
        dv_row_scr[:] = jnp.zeros_like(dv_row_scr[:])
        dt_row_scr[:] = jnp.zeros_like(dt_row_scr[:])

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init_cols():
        dv_col_scr[:] = jnp.zeros_like(dv_col_scr[:])
        dt_col_scr[:] = jnp.zeros_like(dt_col_scr[:])

    v_i = v_row_ref[:]
    t_j = t_col_ref[:]
    gv_i = gv_row_ref[:]
    gt_i = gt_row_ref[:]
    lse_v_i = lse_v_row_ref[:]
    lse_t_i = lse_t_row_ref[:]
    lse_v_j = lse_v_colT_ref[:]
    lse_t_j = lse_t_colT_ref[:]
    gv_j = gv_colT_ref[:]
    gt_j = gt_colT_ref[:]
    rows = i * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 0)
    cols = j * ts + jax.lax.broadcasted_iota(jnp.int32, (ts, ts), 1)
    on_diag = rows == cols
    if pruned:
        keep_v_row = kv_row_ref[:] > 0.5  # [TS, 1]
        keep_t_row = kt_row_ref[:] > 0.5
        keep_v_col = kv_col_ref[:] > 0.5  # [1, TS]
        keep_t_col = kt_col_ref[:] > 0.5

    # shared inter tile (all grid steps): factored single exp — the
    # wrapper gates this path to scale < 80 so exp(z) stays finite
    z_vt = scale * _dot_nt(v_i, t_j, precision)
    if pruned:
        # role-specific masks zero each role's coefficient (the folded
        # sum stays symmetric, so the one-dot-per-tile schedule holds)
        m = jnp.exp(z_vt) * (
            jnp.where(keep_t_col | on_diag, gv_i * jnp.exp(-lse_v_i), 0.0)
            + jnp.where(keep_v_row | on_diag, gt_j * jnp.exp(-lse_t_j), 0.0)
        )
    else:
        m = jnp.exp(z_vt) * (
            gv_i * jnp.exp(-lse_v_i) + gt_j * jnp.exp(-lse_t_j)
        )
    dv_row_scr[:] = dv_row_scr[:] + _dot(m, t_j, precision)
    dt_col_scr[j] = dt_col_scr[j] + jax.lax.dot_general(
        m, v_i, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision,
    )

    @pl.when(j <= i)
    def _intra():
        t_i = t_row_ref[:]
        v_j = v_col_ref[:]
        z_vv = (neg_weight * scale) * _dot_nt(v_i, v_j, precision)
        z_tt = (neg_weight * scale) * _dot_nt(t_i, t_j, precision)
        if pruned:
            # dropped candidates (masked or self) carry NO gradient
            q_v = jnp.exp(z_vv) * (
                jnp.where(keep_v_col & ~on_diag,
                          gv_i * jnp.exp(-lse_v_i), 0.0)
                + jnp.where(keep_v_row & ~on_diag,
                            gv_j * jnp.exp(-lse_v_j), 0.0)
            )
            q_t = jnp.exp(z_tt) * (
                jnp.where(keep_t_col & ~on_diag,
                          gt_i * jnp.exp(-lse_t_i), 0.0)
                + jnp.where(keep_t_row & ~on_diag,
                            gt_j * jnp.exp(-lse_t_j), 0.0)
            )
        else:
            q_v = jnp.exp(z_vv) * (
                gv_i * jnp.exp(-lse_v_i) + gv_j * jnp.exp(-lse_v_j)
            )
            q_v = jnp.where(on_diag, 0.0, q_v)  # zeroed logit: no gradient
            q_t = jnp.exp(z_tt) * (
                gt_i * jnp.exp(-lse_t_i) + gt_j * jnp.exp(-lse_t_j)
            )
            q_t = jnp.where(on_diag, 0.0, q_t)
        dv_row_scr[:] = dv_row_scr[:] + neg_weight * _dot(q_v, v_j, precision)
        dt_row_scr[:] = dt_row_scr[:] + neg_weight * _dot(q_t, t_j, precision)

        @pl.when(j < i)
        def _cols():
            # q is built symmetrically (both anchor roles folded), so the
            # transpose-side dots of the SAME coefficient tiles cover the
            # skipped upper-triangle tiles exactly
            dv_col_scr[j] = dv_col_scr[j] + neg_weight * jax.lax.dot_general(
                q_v, v_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )
            dt_col_scr[j] = dt_col_scr[j] + neg_weight * jax.lax.dot_general(
                q_t, t_i, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )

    @pl.when(j == nj - 1)
    def _fin_rows():
        dv_row_ref[:] = scale * dv_row_scr[:]
        dt_row_ref[:] = scale * dt_row_scr[:]

    @pl.when(i == ni - 1)
    def _fin_cols():
        dv_col_ref[:] = scale * dv_col_scr[j]
        dt_col_ref[:] = scale * dt_col_scr[j]


def _sym_bwd(
    v_norm, t_norm, kv, kt, lse_v, lse_t, g_v, g_t,
    scale, neg_weight, ts, interpret, precision, pruned,
):
    v_norm, t_norm = _fetch_cast(precision, v_norm, t_norm)
    b, d = v_norm.shape
    n = b // ts
    kernel = functools.partial(
        _sym_bwd_kernel,
        scale=scale,
        neg_weight=neg_weight,
        ts=ts,
        precision=_resolve_precision(precision),
        pruned=pruned,
    )
    row = lambda i, j: (i, 0)  # noqa: E731
    col = lambda i, j: (j, 0)  # noqa: E731
    colT = lambda i, j: (0, j)  # noqa: E731
    # v_col is triangle-only here too (dv_col accumulates only from the
    # intra V.V^T tiles) — clamp its window past the diagonal, see _sym_fwd
    tri = lambda i, j: (jnp.minimum(i, j), 0)  # noqa: E731
    mask_specs = (
        [
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),  # kv rows
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),  # kt rows
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),  # kv cols
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),  # kt cols
        ]
        if pruned
        else []
    )
    mask_args = (
        (kv.reshape(b, 1), kt.reshape(b, 1), kv.reshape(1, b), kt.reshape(1, b))
        if pruned
        else ()
    )
    dv_row, dt_row, dv_col, dt_col = pl.pallas_call(
        kernel,
        grid=(n, n),
        in_specs=[
            *mask_specs,
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 1), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), tri, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts), colT, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ts, d), jnp.float32),
            pltpu.VMEM((ts, d), jnp.float32),
            pltpu.VMEM((n, ts, d), jnp.float32),
            pltpu.VMEM((n, ts, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        *mask_args,
        v_norm, t_norm, lse_v, lse_t, g_v, g_t,
        t_norm, v_norm,
        lse_v.reshape(1, b), lse_t.reshape(1, b),
        g_v.reshape(1, b), g_t.reshape(1, b),
    )
    return dv_row + dv_col, dt_row + dt_col


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _sym_lse_pair(v_norm, t_norm, kv, kt, scale, neg_weight, ts, interpret,
                  precision, pruned):
    return _sym_fwd(v_norm, t_norm, kv, kt, scale, neg_weight, ts, interpret,
                    precision, pruned)


def _sym_lse_pair_fwd(v_norm, t_norm, kv, kt, scale, neg_weight, ts,
                      interpret, precision, pruned):
    lse_v, lse_t = _sym_fwd(
        v_norm, t_norm, kv, kt, scale, neg_weight, ts, interpret, precision,
        pruned,
    )
    return (lse_v, lse_t), (v_norm, t_norm, kv, kt, lse_v, lse_t)


def _sym_lse_pair_bwd(scale, neg_weight, ts, interpret, precision, pruned,
                      residuals, cotangents):
    v_norm, t_norm, kv, kt, lse_v, lse_t = residuals
    g_v, g_t = cotangents
    g_v = jnp.asarray(g_v, jnp.float32).reshape(-1, 1)
    g_t = jnp.asarray(g_t, jnp.float32).reshape(-1, 1)
    dv, dt = _sym_bwd(
        v_norm, t_norm, kv, kt, lse_v, lse_t, g_v, g_t,
        scale, neg_weight, ts, interpret, precision, pruned,
    )
    return (
        dv.astype(v_norm.dtype),
        dt.astype(t_norm.dtype),
        jnp.zeros_like(kv),  # 0/1 keep masks: no gradient
        jnp.zeros_like(kt),
    )


_sym_lse_pair.defvjp(_sym_lse_pair_fwd, _sym_lse_pair_bwd)


def _pick_square_tile(b: int, d: int) -> int | None:
    """Largest square tile; capped at 512 — the HIGHEST-precision backward
    with 1024 tiles exceeds what Mosaic can compile (observed HTTP-500
    from the compile helper), and 512 measures equal at DEFAULT.

    Column-side outputs are (1, t) blocks of (1, b) arrays — the shared
    lane-vector rule (fused_crossclr._lane_block_ok) applies."""
    for t in (512, 256, 128, 64):
        if not _lane_block_ok(t, b):
            continue
        if b % t == 0 and t * _lane_pad(max(d, 1)) * 4 * 10 < 64 * 1024 * 1024:
            return t
    return None


# the sym BACKWARD holds TWO [B, d_pad] fp32 column accumulators (dv_col
# + dt_col scratch); cap their combined size leaving ~28MB of the 100MB
# scoped-VMEM limit for the double-buffered tile windows and row scratch
# (~26MB at ts=512, d=512) — b=16384 x d=512 (67MB) fits, b=24576 (101MB)
# must not compile
_MAX_SYM_ACC_BYTES = 72 * 1024 * 1024


def sym_supported(
    b: int, d: int, scale: float, neg_weight: float, pruned: bool = False
) -> bool:
    # two accumulators, padded d; the coefficient math is the factored
    # exp(z)*exp(-lse) form, hence the _coeff_safe underflow gate on top
    # of the exp(z) bounds
    if pruned:
        # pruned rows have no zeroed-diagonal exp(−m0) floor — the row sum
        # is bounded below only by the always-kept positive at
        # exp(z_pos − m0) ≥ exp(−(s + m0)) ≥ exp(−2·m0).  Requiring
        # 2·m0 ≤ 80 keeps EVERY kept exp argument in [−80, 0]: nothing
        # flushes (fp32 flush ≈ e^−87.3) and log() stays finite.  Smaller
        # temperatures take the online-max dual kernels.
        m0 = max(scale, neg_weight * scale, 0.0)
        if 2.0 * m0 > 80.0:
            return False
    return (
        _pick_square_tile(b, d) is not None
        and 2 * b * _lane_pad(max(d, 1)) * 4 <= _MAX_SYM_ACC_BYTES
        and 0.0 < scale <= 80.0
        and 0.0 <= neg_weight * scale <= 80.0
        and _coeff_safe(b, scale, neg_weight)
    )
