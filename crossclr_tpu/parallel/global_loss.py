"""Globally-batched CrossCLR loss: negatives all-gathered over the mesh.

The reference's negative pool is the local batch (loss.py:83-88); on a pod
slice the TPU-native framework widens it to the *global* batch by
all-gathering normalized features over the ICI ``data`` axis
(BASELINE.json north star / config 5).

Gradient correctness (SURVEY.md §7 hard part #2) comes from the row-block
formulation: under ``shard_map`` each device computes the loss rows of its
OWN anchors against the gathered candidate set, and the total loss is the
``psum`` of row sums divided by the global batch.  Because every device
owns a distinct row block, the transpose of ``all_gather`` (a
``psum_scatter``) sums exactly each device's contribution to each
candidate's gradient — no double counting, no manual VJP needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..losses.functional import l2_normalize
from .mesh import DATA_AXIS

__all__ = [
    "global_cross_clr_intra",
    "global_row_losses",
    "local_rows_cross_clr_intra",
]


def local_rows_cross_clr_intra(
    anchor_rows: jax.Array,
    anchor_all: jax.Array,
    other_all: jax.Array,
    row_offset: jax.Array | int,
    *,
    temperature: float,
    negative_weight: float,
) -> jax.Array:
    """Per-row losses for a block of anchors against the full candidate set.

    ``anchor_rows``: [b, D] normalized local anchors (rows
    ``row_offset .. row_offset+b`` of the global batch).
    ``anchor_all`` / ``other_all``: [B, D] normalized global features.
    Semantics identical to the single-device loss (zeroed global diagonal,
    candidate set = B inter + B weighted intra columns).
    """
    b = anchor_rows.shape[0]
    n = anchor_all.shape[0]
    scale = 1.0 / temperature
    inter = scale * jnp.matmul(
        anchor_rows, other_all.T, precision=jax.lax.Precision.HIGHEST
    )
    intra = (negative_weight * scale) * jnp.matmul(
        anchor_rows, anchor_all.T, precision=jax.lax.Precision.HIGHEST
    )
    rows = row_offset + jnp.arange(b)[:, None]
    cols = jnp.arange(n)[None, :]
    intra = jnp.where(rows == cols, 0.0, intra)  # parity: zeroed, not dropped
    cand = jnp.concatenate([inter, intra], axis=1)
    lse = jax.scipy.special.logsumexp(cand, axis=1)
    # positive column for global row r is column r of the inter block
    pos = jnp.squeeze(jnp.take_along_axis(inter, rows, axis=1), axis=1)
    return lse - pos


def global_row_losses(
    v_loc: jax.Array,
    t_loc: jax.Array,
    axis: str,
    *,
    temperature: float,
    negative_weight: float,
    use_fused: bool = False,
    interpret: bool | None = None,
    precision: str | None = None,
) -> tuple[jax.Array, jax.Array, int]:
    """Per-row global-negative losses for the local shard's anchors.

    Must be called INSIDE a shard_map over ``axis``: normalizes the local
    features, all-gathers them, and computes each local anchor row's loss
    against the full candidate set.  Returns ``(loss_v_rows, loss_t_rows,
    n_global)`` — reduction (psum placement) is the caller's business,
    because gradient semantics differ between differentiating through the
    shard_map boundary and differentiating inside the body.  Single source
    of truth shared by global_cross_clr_intra and the Trainer.
    """
    v = l2_normalize(v_loc, axis=1)
    t = l2_normalize(t_loc, axis=1)
    v_all = jax.lax.all_gather(v, axis, tiled=True)
    t_all = jax.lax.all_gather(t, axis, tiled=True)
    b_loc = v.shape[0]
    n = v_all.shape[0]
    offset = jax.lax.axis_index(axis) * b_loc
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if use_fused:
        if interpret:
            supported = b_loc % 8 == 0 and n % 8 == 0
        else:
            from ..ops.fused_global import rows_supported

            supported = rows_supported(b_loc, n, v.shape[1])
        use_fused = supported  # odd shapes: jnp row-block path below
    if use_fused:
        loss_v, loss_t = _fused_rows_losses(
            v, t, v_all, t_all, offset,
            temperature, negative_weight, interpret, precision,
        )
    else:
        loss_v = local_rows_cross_clr_intra(
            v, v_all, t_all, offset,
            temperature=temperature, negative_weight=negative_weight,
        )
        loss_t = local_rows_cross_clr_intra(
            t, t_all, v_all, offset,
            temperature=temperature, negative_weight=negative_weight,
        )
    return loss_v, loss_t, n


def _fused_rows_losses(v_loc, t_loc, v_all, t_all, offset, temperature,
                       negative_weight, interpret, precision):
    """Per-row losses via the rectangular Pallas kernels (ops.fused_global):
    lse over the gathered candidates minus the positive logit (which lives
    in the local shard: pos_r = s·ṽᵣ·t̃ᵣ, identical for both directions)."""
    from ..ops.fused_global import fused_lse_rows

    kw = dict(
        temperature=temperature,
        negative_weight=negative_weight,
        interpret=interpret,
        precision=precision,
    )
    lse_v = fused_lse_rows(v_loc, v_all, t_all, offset, **kw)
    lse_t = fused_lse_rows(t_loc, t_all, v_all, offset, **kw)
    pos = jnp.sum(v_loc * t_loc, axis=1, keepdims=True) / temperature
    return (lse_v - pos)[:, 0], (lse_t - pos)[:, 0]


def global_cross_clr_intra(
    video_features: jax.Array,
    text_features: jax.Array,
    *,
    mesh: Mesh,
    axis: str = DATA_AXIS,
    temperature: float = 0.03,
    negative_weight: float = 0.8,
    use_fused: bool = False,
    interpret: bool = False,
    precision: str | None = None,
) -> jax.Array:
    """CrossCLR-onlyIntraModality over the GLOBAL batch on a device mesh.

    ``video_features`` / ``text_features`` are globally-shaped ``[B, D]``
    arrays sharded over ``axis`` on their leading dim (or about to be —
    shard_map partitions them).  Returns the replicated scalar loss, equal
    (within fp32 tolerance) to the single-device loss on the concatenated
    batch.  Differentiable; gradients land on the local shards.

    ``use_fused=True`` routes each shard's row block through the
    rectangular Pallas kernels (ops.fused_global) instead of materializing
    the ``[b_loc, 2B]`` candidate matrix — required headroom for 32k-batch
    configs, where the jnp path would hold ~1 GiB of logits per device.
    """

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        # pallas_call outputs carry no varying-mesh-axes metadata, which
        # trips shard_map's vma checker on the fused path
        check_vma=False,
    )
    def _sharded(v_loc, t_loc):
        loss_v, loss_t, n = global_row_losses(
            v_loc, t_loc, axis,
            temperature=temperature, negative_weight=negative_weight,
            use_fused=use_fused, interpret=interpret, precision=precision,
        )
        total = jax.lax.psum(jnp.sum(loss_v) + jnp.sum(loss_t), axis)
        return total / (2 * n)

    return _sharded(video_features, text_features)
