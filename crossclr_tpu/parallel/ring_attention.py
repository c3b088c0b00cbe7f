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

Per-block work has two implementations (``block_impl``):

* ``"jnp"`` — plain XLA-fused scores; right when a ring shard's
  ``[s_loc, s_loc]`` block is small, but it materializes that block.
* ``"flash"`` — each ring step runs the Pallas blockwise kernels from
  ``ops.flash_attention`` on the visiting K/V block, so scores never
  materialize beyond ``[bq, bk]`` VMEM tiles even when the LOCAL shard is
  itself long (ring-of-flash).  The flash forward's logsumexp output is
  exactly the statistic needed to merge partial results across ring steps
  — ``merge((o₁,lse₁),(o₂,lse₂))`` over disjoint key sets — and, saved as
  the residual, to drive the flash backward with globally-normalized
  probabilities (``p = exp(s − lse_global)``), making each block's
  dK/dV/dq contribution exact without any cross-block correction.

``"auto"`` (the default) picks flash when the kernels support the local
shape on this backend, else jnp.
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


# ---------------------------------------------------------------------------
# flash-block implementation (ring-of-flash)
# ---------------------------------------------------------------------------


def _merge_partials(o, lse, o_blk, lse_blk):
    """Merge two partial attention results over DISJOINT key sets.

    Each partial is (normalized output, logsumexp) for its keys; the
    merged pair is the exact result over the union.  One of the two
    weights is always exactly 1, so the denominator is ≥ 1 — no guards
    needed, including rows masked everywhere (both lse at the floor →
    both outputs 0 → merged 0)."""
    m = jnp.maximum(lse, lse_blk)
    a = jnp.exp(lse - m)
    b = jnp.exp(lse_blk - m)
    o = (a * o + b * o_blk.astype(jnp.float32)) / (a + b)
    return o, m + jnp.log(a + b)


def _ring_fwd_flash(q, k, v, mask, axis, scale, interpret, precision):
    from ..ops.flash_attention import _flash_fwd, _pick_blocks, fold_heads

    bq, bk = _pick_blocks(q.shape[2])
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf, kf, vf, mrow = fold_heads(q, k, v, mask)

    # dropout=0.0 on the ring path: the hash mask keys on LOCAL block
    # indices, which repeat across devices — ring towers regularize with
    # output dropout instead (models/encoders.py)
    o_blk, lse = _flash_fwd(qf, kf, vf, mrow, None, scale, bq, bk,
                            interpret, precision, 0.0)
    o = o_blk.astype(jnp.float32)
    if n_dev > 1:

        def body(carry, _):
            o, lse, k_b, v_b, m_b = carry
            k_b, v_b, m_b = _rotate((k_b, v_b, m_b), axis, perm)
            o_b, lse_b = _flash_fwd(qf, k_b, v_b, m_b, None, scale, bq, bk,
                                    interpret, precision, 0.0)
            o, lse = _merge_partials(o, lse, o_b, lse_b)
            return (o, lse, k_b, v_b, m_b), None

        (o, lse, _, _, _), _ = jax.lax.scan(
            body, (o, lse, kf, vf, mrow), None, length=n_dev - 1
        )
    # o and lse stay in the folded/padded layout for the backward
    return o, lse


def _ring_bwd_flash(q, k, v, mask, o_fold, lse, dout, axis, scale,
                    interpret, precision):
    from ..ops.flash_attention import _flash_bwd, _pick_blocks, fold_heads

    b, h, s, dh = q.shape
    bq, bk = _pick_blocks(s)
    n_dev = jax.lax.psum(1, axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf, kf, vf, mrow = fold_heads(q, k, v, mask)
    do = fold_heads(dout, dout, dout, None)[0]  # fold+pad dout alone

    # with the GLOBAL (out, lse) the flash backward's p = exp(s − lse) is
    # the globally-normalized probability restricted to this block, so
    # every block call yields its exact dq/dK/dV contribution
    dq_b, dk_t, dv_t = _flash_bwd(qf, kf, vf, mrow, None, o_fold, lse, do,
                                  scale, bq, bk, interpret, precision, 0.0)
    dq = dq_b.astype(jnp.float32)
    dk_t = dk_t.astype(jnp.float32)
    dv_t = dv_t.astype(jnp.float32)
    if n_dev > 1:

        def body(carry, _):
            dq, k_b, v_b, m_b, dk_t, dv_t = carry
            k_b, v_b, m_b, dk_t, dv_t = _rotate(
                (k_b, v_b, m_b, dk_t, dv_t), axis, perm
            )
            dq_b, dk_b, dv_b = _flash_bwd(
                qf, k_b, v_b, m_b, None, o_fold, lse, do, scale, bq, bk,
                interpret, precision, 0.0,
            )
            dq = dq + dq_b.astype(jnp.float32)
            dk_t = dk_t + dk_b.astype(jnp.float32)
            dv_t = dv_t + dv_b.astype(jnp.float32)
            return (dq, k_b, v_b, m_b, dk_t, dv_t), None

        (dq, _, _, _, dk_t, dv_t), _ = jax.lax.scan(
            body, (dq, kf, vf, mrow, dk_t, dv_t), None, length=n_dev - 1
        )
    # carry the travelling dK/dV accumulators the last hop home
    dk_t, dv_t = _rotate((dk_t, dv_t), axis, perm)

    def unfold(x, like):
        return x[:, :, :dh].reshape(b, h, s, dh).astype(like.dtype)

    return unfold(dq, q), unfold(dk_t, k), unfold(dv_t, v)


# ---------------------------------------------------------------------------
# custom VJP over both block implementations
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _ring_core(q, k, v, mask, axis, scale, impl, interpret, precision):
    out, _ = _ring_core_fwd(q, k, v, mask, axis, scale, impl, interpret,
                            precision)
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


def _ring_core_fwd(q, k, v, mask, axis, scale, impl, interpret, precision):
    if impl == "flash":
        b, h, s, dh = q.shape
        o_fold, lse = _ring_fwd_flash(q, k, v, mask, axis, scale,
                                      interpret, precision)
        out = o_fold[:, :, :dh].reshape(b, h, s, dh)
        return out, (q, k, v, mask, o_fold, lse)
    out, m, l = _ring_fwd(q, k, v, mask, axis, scale)
    return out, (q, k, v, mask, out, m, l)


def _ring_core_bwd(axis, scale, impl, interpret, precision, residuals,
                   dout):
    if impl == "flash":
        q, k, v, mask, o_fold, lse = residuals
        dq, dk, dv = _ring_bwd_flash(
            q, k, v, mask, o_fold, lse, dout, axis, scale, interpret,
            precision,
        )
        d_mask = None if mask is None else jnp.zeros_like(mask)
        return dq, dk, dv, d_mask
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


def _resolve_block_impl(block_impl, s_loc, interpret):
    if block_impl != "auto":
        return block_impl
    from ..ops.flash_attention import _pick_blocks, flash_supported

    if flash_supported(s_loc) or (interpret and _pick_blocks(s_loc)):
        return "flash"
    return "jnp"


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
    *,
    axis: str,
    scale: float | None = None,
    block_impl: str = "auto",
    interpret: bool = False,
    precision: str | None = None,
) -> jax.Array:
    """Attention with sequence sharded over ``axis`` — call inside shard_map.

    ``q/k/v``: ``[B, H, s_local, Dh]`` local sequence shards; ``mask``:
    optional ``[B, s_local]`` local key-padding mask.  Returns the local
    ``[B, H, s_local, Dh]`` output slice of exact full-sequence attention.
    Differentiable with O(local block) memory in both passes (see module
    docstring for the hand-written ring backward).

    ``block_impl``: per-block math — ``"flash"`` streams Pallas VMEM
    tiles (long local shards), ``"jnp"`` materializes the local score
    block (small shards), ``"auto"`` picks flash whenever the kernels
    support the local shape on this backend.  ``interpret``/``precision``
    apply to the flash kernels only.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    impl = _resolve_block_impl(block_impl, q.shape[2], interpret)
    if impl == "flash":
        from ..ops.flash_attention import _pick_blocks

        if _pick_blocks(q.shape[2]) is None:
            raise ValueError(
                f"block_impl='flash' needs a local sequence the kernels can "
                f"tile (multiples of 8); got s_local={q.shape[2]}. Use "
                f"block_impl='jnp' or 'auto'."
            )
    out = _ring_core(q, k, v, mask, axis, float(scale), impl, interpret,
                     precision)
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
    block_impl: str = "auto",
    interpret: bool = False,
    precision: str | None = None,
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

    ``block_impl``/``interpret``/``precision``: per-block math, see
    ``ring_attention``.  The flash path runs the shard_map with
    ``check_vma=False``: JAX's varying-axes checker cannot yet see
    through ``pallas_call`` (its interpreter rejects varying operands
    outright, the error message itself prescribing this flag).
    """
    from .mesh import DATA_AXIS

    impl = _resolve_block_impl(
        block_impl, q.shape[2] // mesh.shape[axis], interpret
    )

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
        check_vma=(impl != "flash"),
    )
    def _sharded(*local):
        m = local[3] if len(local) > 3 else None
        return ring_attention(
            local[0], local[1], local[2], m, axis=axis, scale=scale,
            block_impl=impl, interpret=interpret, precision=precision,
        )

    return _sharded(*args)
