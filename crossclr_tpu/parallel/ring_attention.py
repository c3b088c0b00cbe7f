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
shard_map.  Differentiable: the scan body is ``jax.checkpoint``-ed (the
backward re-forms each block's scores instead of storing them) and
``ppermute``'s transpose is the reverse permutation, so gradients flow
back around the ring exactly.

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
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    b, h, s_loc, dh = q.shape
    qf = q.astype(jnp.float32)

    @jax.checkpoint
    def body(carry, _):
        m, l, acc, k_blk, v_blk, mask_blk = carry
        s = _block_scores(qf, k_blk, scale, mask_blk)  # [B,H,sq,sk]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        m_new = jnp.maximum(m_new, _MAX_FLOOR)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_blk.astype(jnp.float32)
        )
        # rotate K/V (and their mask) to the next device on the ring
        k_nxt = jax.lax.ppermute(k_blk, axis, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis, perm)
        mask_nxt = (
            mask_blk
            if mask_blk is None
            else jax.lax.ppermute(mask_blk, axis, perm)
        )
        return (m_new, l_new, acc_new, k_nxt, v_nxt, mask_nxt), None

    # derive carries from qf so their varying-mesh-axes type matches the
    # body outputs under shard_map (fresh constants are unvarying)
    zeros_row = jnp.zeros_like(qf[..., :1])
    init = (
        zeros_row + _MAX_FLOOR,  # m
        zeros_row,  # l
        jnp.zeros_like(qf),  # acc
        k,
        v,
        mask,
    )
    (m, l, acc, _, _, _), _ = jax.lax.scan(body, init, None, length=n_dev)
    safe_l = jnp.where(l > 0, l, 1.0)
    out = acc / safe_l
    if mask is not None:
        # rows whose ENTIRE global key set is masked emit zeros; l is the
        # exact full-sequence softmax denominator, so l == 0 detects them
        out = jnp.where(l > 0, out, 0.0)
    return out.astype(q.dtype)


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
