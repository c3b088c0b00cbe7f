"""Ring attention: sequence-parallel attention over a mesh axis.

SURVEY.md §5 flags long-context encoders as the stretch goal the released
reference (pooled ``[B, f_dim]`` features, loss.py:76) never needed.  When
one device can no longer hold a sequence, shard the SEQUENCE dimension
over a mesh axis: every position-wise op (dense layers, layernorm, GELU)
runs on the local shard untouched, and only attention needs communication
— each device's queries must see every device's keys/values.

The TPU-native shape of that communication is a ring over ICI: instead of
all-gathering K/V (O(S·Dh) peak memory per device and a bandwidth burst),
each device passes its K/V block to its ring neighbor with
``jax.lax.ppermute`` while accumulating flash-style online softmax over
the blocks it has seen.  After ``n_devices`` steps every query attended to
every key, with peak memory one block and communication fully overlappable
with the block computation.

``ring_attention`` is the shard_map-side primitive (call it INSIDE a
shard_map whose in_specs shard q/k/v on the sequence dim);
``sequence_parallel_attention`` is the standalone wrapper that builds the
shard_map.  Differentiable via a HAND-WRITTEN ring backward (custom_vjp):
autodiff-through-the-scan would stack every step's K/V carry as a saved
residual — O(n_dev · block) ≈ 3× the full global K/V per device, defeating
the module's purpose exactly at the scale it targets.  Instead the
backward runs a SECOND ring pass: per-block softmax probabilities are
re-formed from the saved (row-max, denominator) pair, and the dK/dV
accumulators rotate around the ring alongside their K/V blocks, arriving
home after the full circle.  Peak memory stays O(local block) in both
passes; communication is ``n_devices − 1`` neighbor ppermutes forward and
``n_devices`` backward (the last one carries only dK/dV home).

Per-block scores are plain jnp (XLA-fused): a ring shard's ``[s_loc,
s_loc]`` block is small by construction — the Pallas blockwise kernel
(``ops.flash_attention``) is the single-chip answer for LONG local
sequences, this module is the cross-chip one; a tower picks whichever
matches its layout (``TowerConfig.attention``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS

__all__ = ["ring_attention", "sequence_parallel_attention"]

_NEG_INF = float("-inf")
_MAX_FLOOR = -1e30


def _block_scores(q, k, scale, mask):
    s = scale * jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    if mask is not None:
        s = jnp.where(mask.astype(bool)[:, None, None, :], s, _NEG_INF)
    return s


def _rotate(arrs, axis, perm):
    return tuple(
        a if a is None else jax.lax.ppermute(a, axis, perm) for a in arrs
    )


def _online_block(qf, k_blk, v_blk, mask_blk, scale, m, l, acc):
    """Fold one K/V block into the online-softmax accumulators."""
    s = _block_scores(qf, k_blk, scale, mask_blk)  # [B,H,sq,sk]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    m_new = jnp.maximum(m_new, _MAX_FLOOR)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def _grad_block(qf, do, delta, lse, k_blk, v_blk, mask_blk, scale,
                dq_acc, dk_blk, dv_blk):
    """Accumulate one block's contribution to dq (local) and dk/dv (the
    block's travelling accumulators).  ``p = exp(s − lse)`` re-forms the
    exact normalized probabilities from the saved forward statistics."""
    s = _block_scores(qf, k_blk, scale, mask_blk)
    p = jnp.exp(s - lse)  # masked → exp(−inf)=0; normalized rows
    dv_blk = dv_blk + jnp.einsum("bhqk,bhqd->bhkd", p, do)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do, v_blk.astype(jnp.float32))
    ds = p * (dp - delta) * scale
    dq_acc = dq_acc + jnp.einsum("bhqk,bhkd->bhqd", ds, k_blk.astype(jnp.float32))
    dk_blk = dk_blk + jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
    return dq_acc, dk_blk, dv_blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ring_core(q, k, v, mask, axis, scale):
    out, _, _ = _ring_fwd(q, k, v, mask, axis, scale)
    return out


def _ring_fwd(q, k, v, mask, axis, scale):
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf = q.astype(jnp.float32)

    # own block first, then n_dev − 1 (rotate → attend) steps: the K/V
    # blocks do NOT need to complete the circle in the forward, so the
    # final rotation of the old formulation is gone
    zeros_row = jnp.zeros_like(qf[..., :1])
    m, l, acc = _online_block(
        qf, k, v, mask, scale,
        zeros_row + _MAX_FLOOR, zeros_row, jnp.zeros_like(qf),
    )
    if n_dev > 1:

        def body(carry, _):
            m, l, acc, k_blk, v_blk, mask_blk = carry
            k_blk, v_blk, mask_blk = _rotate(
                (k_blk, v_blk, mask_blk), axis, perm
            )
            m, l, acc = _online_block(
                qf, k_blk, v_blk, mask_blk, scale, m, l, acc
            )
            return (m, l, acc, k_blk, v_blk, mask_blk), None

        (m, l, acc, _, _, _), _ = jax.lax.scan(
            body, (m, l, acc, k, v, mask), None, length=n_dev - 1
        )
    safe_l = jnp.where(l > 0, l, 1.0)
    out = acc / safe_l
    if mask is not None:
        # rows whose ENTIRE global key set is masked emit zeros; l is the
        # exact full-sequence softmax denominator, so l == 0 detects them
        out = jnp.where(l > 0, out, 0.0)
    return out, m, l


def _ring_core_fwd(q, k, v, mask, axis, scale):
    out, m, l = _ring_fwd(q, k, v, mask, axis, scale)
    return out, (q, k, v, mask, out, m, l)


def _ring_core_bwd(axis, scale, residuals, dout):
    q, k, v, mask, out, m, l = residuals
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf = q.astype(jnp.float32)
    do = dout.astype(jnp.float32)
    safe_l = jnp.where(l > 0, l, 1.0)
    lse = m + jnp.log(safe_l)  # fully-masked rows: m = _MAX_FLOOR → p = 0
    delta = jnp.sum(do * out, axis=-1, keepdims=True)

    # derive the accumulators from the inputs so their varying-mesh-axes
    # type matches the scan body outputs under shard_map (fresh constants
    # are unvarying)
    dq = jnp.zeros_like(qf)
    dk0 = jnp.zeros_like(k, dtype=jnp.float32)
    dv0 = jnp.zeros_like(v, dtype=jnp.float32)
    dq, dk_blk, dv_blk = _grad_block(
        qf, do, delta, lse, k, v, mask, scale, dq, dk0, dv0
    )
    if n_dev > 1:

        def body(carry, _):
            dq_acc, k_blk, v_blk, mask_blk, dk_blk, dv_blk = carry
            # dK/dV accumulators travel WITH their K/V blocks
            k_blk, v_blk, mask_blk, dk_blk, dv_blk = _rotate(
                (k_blk, v_blk, mask_blk, dk_blk, dv_blk), axis, perm
            )
            dq_acc, dk_blk, dv_blk = _grad_block(
                qf, do, delta, lse, k_blk, v_blk, mask_blk, scale,
                dq_acc, dk_blk, dv_blk,
            )
            return (dq_acc, k_blk, v_blk, mask_blk, dk_blk, dv_blk), None

        (dq, _, _, _, dk_blk, dv_blk), _ = jax.lax.scan(
            body, (dq, k, v, mask, dk_blk, dv_blk), None, length=n_dev - 1
        )
    # the blocks have visited all n_dev devices and sit one hop short of
    # home: one final rotation carries ONLY the gradients back
    dk_blk, dv_blk = _rotate((dk_blk, dv_blk), axis, perm)
    d_mask = None if mask is None else jnp.zeros_like(mask)
    return (
        dq.astype(q.dtype),
        dk_blk.astype(k.dtype),
        dv_blk.astype(v.dtype),
        d_mask,
    )


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    axis: str,
    scale: float | None = None,
) -> jax.Array:
    """Attention with sequence sharded over ``axis`` — call inside shard_map.

    ``q/k/v``: ``[B, H, s_local, Dh]`` local sequence shards; ``mask``:
    optional ``[B, s_local]`` local key-padding mask.  Returns the local
    ``[B, H, s_local, Dh]`` output slice of exact full-sequence attention.
    Differentiable with O(local block) memory in both passes (see module
    docstring for the hand-written ring backward).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _ring_core(q, k, v, mask, axis, float(scale))


def sequence_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
    scale: float | None = None,
) -> jax.Array:
    """Standalone wrapper: exact attention over globally-shaped
    ``[B, H, S, Dh]`` inputs with the SEQUENCE dim sharded over ``axis``.

    Under jit/GSPMD this composes with position-wise layers that keep
    activations sequence-sharded; communication is ``n_devices − 1``
    neighbor ppermutes of one K/V block each — the ICI-friendly layout.

    The BATCH dim is kept sharded over the ``data`` mesh axis whenever it
    divides evenly (decided at trace time from static shapes): a
    batch-replicated spec would make GSPMD all-gather the activations over
    ``data`` and run the full-batch ring on every data-parallel device —
    redundant compute that defeats the dp×sp layout.  Odd batches (e.g.
    remainder eval batches) fall back to the replicated spec.
    """
    from .mesh import DATA_AXIS

    bspec = None
    if (
        DATA_AXIS in mesh.shape
        and mesh.shape[DATA_AXIS] > 1
        and axis != DATA_AXIS
        and q.shape[0] % mesh.shape[DATA_AXIS] == 0
    ):
        bspec = DATA_AXIS

    in_specs = [
        P(bspec, None, axis, None),
        P(bspec, None, axis, None),
        P(bspec, None, axis, None),
    ]
    args = [q, k, v]
    if mask is not None:
        in_specs.append(P(bspec, axis))
        args.append(mask)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(bspec, None, axis, None),
    )
    def _sharded(*local):
        m = local[3] if len(local) > 3 else None
        return ring_attention(
            local[0], local[1], local[2], m, axis=axis, scale=scale
        )

    return _sharded(*args)
