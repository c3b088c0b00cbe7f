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

Attention-probability dropout (``dropout_rate`` > 0) rides both block
implementations: the stateless hash mask from ``ops.flash_attention``
keys on GLOBAL (batch·head, query, key) indices, and each ring step
passes its block's (q_offset, k_offset) window position, so the sharded
run drops exactly the entries a single-chip run over the full sequence
would (pinned against ``mha_reference`` in tests).  Dropout zeroes
normalized probabilities without renormalizing (torch semantics), which
is precisely why it composes with the ring: the softmax DENOMINATOR
keeps every term, so the (out, lse) merge across disjoint key blocks is
unchanged, and ``delta = rowsum(do∘out)`` stays exact because ``out``
already carries the mask.  Under a data-sharded batch the
``sequence_parallel_attention`` wrapper additionally passes each dp
shard's GLOBAL folded batch·head offset (``dropout_bh_offset``), so the
mask keys on global row identity — dp×sp runs drop exactly what the
single-chip run would (with a replicated seed and no offset, every dp
shard would draw the identical mask, i.e. perfectly correlated — not
iid — noise across shards).
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


def _block_keep(qf, seed, dropout, q_off, k_off, sk):
    """[B,H,sq,sk] keep mask for one ring block — the kernels' exact hash
    mask (ops.flash_attention) windowed at this block's global offsets.
    ``seed`` is the ring core's (2,) fp32 carrier ``[seed, bh_offset]``.
    None when dropout is off."""
    if dropout <= 0.0:
        return None
    from ..ops.flash_attention import dropout_keep_mask

    b, h, sq, _ = qf.shape
    return dropout_keep_mask(
        b, h, sq, seed[0], dropout, sk=sk, q_offset=q_off, k_offset=k_off,
        bh_offset=seed[1],
    )


def _online_block(qf, k_blk, v_blk, mask_blk, scale, m, l, acc, keep=None):
    """Fold one K/V block into the online-softmax accumulators.  ``keep``
    (probability-dropout mask) zeroes value-aggregation terms only — the
    denominator ``l`` keeps every term (torch dropout semantics); the
    survivor 1/(1−r) scaling is applied once at the end by the caller."""
    s = _block_scores(qf, k_blk, scale, mask_blk)  # [B,H,sq,sk]
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    m_new = jnp.maximum(m_new, _MAX_FLOOR)
    alpha = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new)
    l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    p_v = p if keep is None else jnp.where(keep, p, 0.0)
    acc_new = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p_v, v_blk.astype(jnp.float32)
    )
    return m_new, l_new, acc_new


def _grad_block(qf, do, delta, lse, k_blk, v_blk, mask_blk, scale,
                dq_acc, dk_blk, dv_blk, keep=None, inv_keep=1.0):
    """Accumulate one block's contribution to dq (local) and dk/dv (the
    block's travelling accumulators).  ``p = exp(s − lse)`` re-forms the
    exact normalized probabilities from the saved forward statistics.
    Under dropout, dP flows only through kept entries (scaled 1/(1−r)) —
    ``delta`` already carries the mask via the saved ``out``."""
    s = _block_scores(qf, k_blk, scale, mask_blk)
    p = jnp.exp(s - lse)  # masked → exp(−inf)=0; normalized rows
    pd = p if keep is None else jnp.where(keep, p * inv_keep, 0.0)
    dv_blk = dv_blk + jnp.einsum("bhqk,bhqd->bhkd", pd, do)
    dp = jnp.einsum("bhqd,bhkd->bhqk", do, v_blk.astype(jnp.float32))
    ds = (pd * dp - p * delta) * scale
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


def _ring_fwd_flash(q, k, v, mask, seed, axis, scale, interpret, precision,
                    dropout):
    from ..ops.flash_attention import (
        _flash_fwd, _pick_blocks, fold_heads, seed_operand,
    )

    s_loc = q.shape[2]
    bq, bk = _pick_blocks(s_loc)
    n_dev = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf, kf, vf, mrow = fold_heads(q, k, v, mask)

    # the kernels' hash mask keys on GLOBAL indices via the traced SMEM
    # (q_offset, k_offset) operands: my queries sit at me·s_loc, and at
    # ring step t the visiting K/V block belongs to device (me − t) mod n
    def seed_arr(t):
        if dropout <= 0.0:
            return None
        k_off = ((me - t) % n_dev) * s_loc
        return seed_operand(seed[0], me * s_loc, k_off, seed[1])

    o_blk, lse = _flash_fwd(qf, kf, vf, mrow, seed_arr(0), scale, bq, bk,
                            interpret, precision, dropout)
    o = o_blk.astype(jnp.float32)
    if n_dev > 1:

        def body(carry, t):
            o, lse, k_b, v_b, m_b = carry
            k_b, v_b, m_b = _rotate((k_b, v_b, m_b), axis, perm)
            o_b, lse_b = _flash_fwd(qf, k_b, v_b, m_b, seed_arr(t), scale,
                                    bq, bk, interpret, precision, dropout)
            o, lse = _merge_partials(o, lse, o_b, lse_b)
            return (o, lse, k_b, v_b, m_b), None

        (o, lse, _, _, _), _ = jax.lax.scan(
            body, (o, lse, kf, vf, mrow), jnp.arange(1, n_dev)
        )
    # o and lse stay in the folded/padded layout for the backward
    return o, lse


def _ring_bwd_flash(q, k, v, mask, o_fold, lse, dout, seed, axis, scale,
                    interpret, precision, dropout):
    from ..ops.flash_attention import (
        _flash_bwd, _pick_blocks, fold_heads, seed_operand,
    )

    b, h, s, dh = q.shape
    bq, bk = _pick_blocks(s)
    n_dev = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf, kf, vf, mrow = fold_heads(q, k, v, mask)
    do = fold_heads(dout, dout, dout, None)[0]  # fold+pad dout alone

    def seed_arr(t):  # same global offsets as the forward ring step t
        if dropout <= 0.0:
            return None
        k_off = ((me - t) % n_dev) * s
        return seed_operand(seed[0], me * s, k_off, seed[1])

    # with the GLOBAL (out, lse) the flash backward's p = exp(s − lse) is
    # the globally-normalized probability restricted to this block, so
    # every block call yields its exact dq/dK/dV contribution
    dq_b, dk_t, dv_t = _flash_bwd(qf, kf, vf, mrow, seed_arr(0), o_fold,
                                  lse, do, scale, bq, bk, interpret,
                                  precision, dropout)
    dq = dq_b.astype(jnp.float32)
    dk_t = dk_t.astype(jnp.float32)
    dv_t = dv_t.astype(jnp.float32)
    if n_dev > 1:

        def body(carry, t):
            dq, k_b, v_b, m_b, dk_t, dv_t = carry
            k_b, v_b, m_b, dk_t, dv_t = _rotate(
                (k_b, v_b, m_b, dk_t, dv_t), axis, perm
            )
            dq_b, dk_b, dv_b = _flash_bwd(
                qf, k_b, v_b, m_b, seed_arr(t), o_fold, lse, do, scale,
                bq, bk, interpret, precision, dropout,
            )
            dq = dq + dq_b.astype(jnp.float32)
            dk_t = dk_t + dk_b.astype(jnp.float32)
            dv_t = dv_t + dv_b.astype(jnp.float32)
            return (dq, k_b, v_b, m_b, dk_t, dv_t), None

        (dq, _, _, _, dk_t, dv_t), _ = jax.lax.scan(
            body, (dq, kf, vf, mrow, dk_t, dv_t), jnp.arange(1, n_dev)
        )
    # carry the travelling dK/dV accumulators the last hop home
    dk_t, dv_t = _rotate((dk_t, dv_t), axis, perm)

    def unfold(x, like):
        return x[:, :, :dh].reshape(b, h, s, dh).astype(like.dtype)

    return unfold(dq, q), unfold(dk_t, k), unfold(dv_t, v)


# ---------------------------------------------------------------------------
# custom VJP over both block implementations
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _ring_core(q, k, v, mask, seed, axis, scale, impl, interpret, precision,
               dropout):
    out, _ = _ring_core_fwd(q, k, v, mask, seed, axis, scale, impl,
                            interpret, precision, dropout)
    return out


def _ring_fwd(q, k, v, mask, seed, axis, scale, dropout):
    n_dev = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    s_loc = q.shape[2]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf = q.astype(jnp.float32)

    def keep(t):  # this ring step's dropout window (None when off)
        return _block_keep(
            qf, seed, dropout, me * s_loc, ((me - t) % n_dev) * s_loc, s_loc
        )

    # own block first, then n_dev − 1 (rotate → attend) steps: the K/V
    # blocks do NOT need to complete the circle in the forward, so the
    # final rotation of the old formulation is gone
    zeros_row = jnp.zeros_like(qf[..., :1])
    m, l, acc = _online_block(
        qf, k, v, mask, scale,
        zeros_row + _MAX_FLOOR, zeros_row, jnp.zeros_like(qf), keep(0),
    )
    if n_dev > 1:

        def body(carry, t):
            m, l, acc, k_blk, v_blk, mask_blk = carry
            k_blk, v_blk, mask_blk = _rotate(
                (k_blk, v_blk, mask_blk), axis, perm
            )
            m, l, acc = _online_block(
                qf, k_blk, v_blk, mask_blk, scale, m, l, acc, keep(t)
            )
            return (m, l, acc, k_blk, v_blk, mask_blk), None

        (m, l, acc, _, _, _), _ = jax.lax.scan(
            body, (m, l, acc, k, v, mask), jnp.arange(1, n_dev)
        )
    safe_l = jnp.where(l > 0, l, 1.0)
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0
    out = acc * (inv_keep / safe_l)
    if mask is not None:
        # rows whose ENTIRE global key set is masked emit zeros; l is the
        # exact full-sequence softmax denominator, so l == 0 detects them
        out = jnp.where(l > 0, out, 0.0)
    return out, m, l


def _ring_core_fwd(q, k, v, mask, seed, axis, scale, impl, interpret,
                   precision, dropout):
    if impl == "flash":
        b, h, s, dh = q.shape
        o_fold, lse = _ring_fwd_flash(q, k, v, mask, seed, axis, scale,
                                      interpret, precision, dropout)
        out = o_fold[:, :, :dh].reshape(b, h, s, dh)
        return out, (q, k, v, mask, seed, o_fold, lse)
    out, m, l = _ring_fwd(q, k, v, mask, seed, axis, scale, dropout)
    return out, (q, k, v, mask, seed, out, m, l)


def _ring_core_bwd(axis, scale, impl, interpret, precision, dropout,
                   residuals, dout):
    if impl == "flash":
        q, k, v, mask, seed, o_fold, lse = residuals
        dq, dk, dv = _ring_bwd_flash(
            q, k, v, mask, o_fold, lse, dout, seed, axis, scale, interpret,
            precision, dropout,
        )
        d_mask = None if mask is None else jnp.zeros_like(mask)
        return dq, dk, dv, d_mask, jnp.zeros_like(seed)
    q, k, v, mask, seed, out, m, l = residuals
    n_dev = jax.lax.psum(1, axis)
    me = jax.lax.axis_index(axis)
    s_loc = q.shape[2]
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    qf = q.astype(jnp.float32)
    do = dout.astype(jnp.float32)
    safe_l = jnp.where(l > 0, l, 1.0)
    lse = m + jnp.log(safe_l)  # fully-masked rows: m = _MAX_FLOOR → p = 0
    delta = jnp.sum(do * out, axis=-1, keepdims=True)
    inv_keep = 1.0 / (1.0 - dropout) if dropout > 0.0 else 1.0

    def keep(t):  # regenerated bit-identically to the forward's step t
        return _block_keep(
            qf, seed, dropout, me * s_loc, ((me - t) % n_dev) * s_loc, s_loc
        )

    # derive the accumulators from the inputs so their varying-mesh-axes
    # type matches the scan body outputs under shard_map (fresh constants
    # are unvarying)
    dq = jnp.zeros_like(qf)
    dk0 = jnp.zeros_like(k, dtype=jnp.float32)
    dv0 = jnp.zeros_like(v, dtype=jnp.float32)
    dq, dk_blk, dv_blk = _grad_block(
        qf, do, delta, lse, k, v, mask, scale, dq, dk0, dv0,
        keep(0), inv_keep,
    )
    if n_dev > 1:

        def body(carry, t):
            dq_acc, k_blk, v_blk, mask_blk, dk_blk, dv_blk = carry
            # dK/dV accumulators travel WITH their K/V blocks
            k_blk, v_blk, mask_blk, dk_blk, dv_blk = _rotate(
                (k_blk, v_blk, mask_blk, dk_blk, dv_blk), axis, perm
            )
            dq_acc, dk_blk, dv_blk = _grad_block(
                qf, do, delta, lse, k_blk, v_blk, mask_blk, scale,
                dq_acc, dk_blk, dv_blk, keep(t), inv_keep,
            )
            return (dq_acc, k_blk, v_blk, mask_blk, dk_blk, dv_blk), None

        (dq, _, _, _, dk_blk, dv_blk), _ = jax.lax.scan(
            body, (dq, k, v, mask, dk_blk, dv_blk), jnp.arange(1, n_dev)
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
        jnp.zeros_like(seed),  # fp32 seed carrier: no gradient
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
    dropout_rate: float = 0.0,
    dropout_seed=0,
    dropout_bh_offset=0,
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

    ``dropout_rate`` > 0 applies attention-probability dropout with the
    flash kernels' global-index hash mask — the sharded result equals the
    single-chip run with the same ``dropout_seed`` (a python int or a
    traced scalar; fresh per step for training).  When the BATCH is also
    sharded (dp×sp), pass ``dropout_bh_offset`` = this shard's base row
    in the global folded batch·head range (``data_index · B_local · H``)
    so data-parallel shards draw the same decorrelated masks the
    single-chip run would — with a replicated seed and offset 0, every
    dp shard would drop identical entries.
    """
    if not 0.0 <= dropout_rate < 1.0:
        raise ValueError(f"dropout_rate must be in [0, 1), got {dropout_rate}")
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
    from ..ops.flash_attention import fold_seed

    seed = jnp.stack([
        fold_seed(dropout_seed).reshape(()),
        jnp.asarray(dropout_bh_offset, jnp.float32).reshape(()),
    ])
    out = _ring_core(q, k, v, mask, seed, axis, float(scale), impl,
                     interpret, precision, float(dropout_rate))
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
    dropout_rate: float = 0.0,
    dropout_seed=0,
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
        P(),  # dropout seed: replicated scalar
    ]
    args = [q, k, v, jnp.asarray(dropout_seed, jnp.float32)]
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
        m = local[4] if len(local) > 4 else None
        bh_off = 0
        if bspec is not None and dropout_rate > 0.0:
            # batch sharded over `data`: place this shard's rows in the
            # GLOBAL folded batch·head range so dp shards draw the same
            # decorrelated dropout the single-chip run would (seed is
            # replicated; local row indices alias across shards)
            b_loc, h_loc = local[0].shape[0], local[0].shape[1]
            bh_off = jax.lax.axis_index(DATA_AXIS) * (b_loc * h_loc)
        return ring_attention(
            local[0], local[1], local[2], m, axis=axis, scale=scale,
            block_impl=impl, interpret=interpret, precision=precision,
            dropout_rate=dropout_rate, dropout_seed=local[3],
            dropout_bh_offset=bh_off,
        )

    return _sharded(*args)
