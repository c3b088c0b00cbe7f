"""Randomized cross-checks of the Pallas kernel families against the jnp
formulations — shapes, hyperparameters, offsets, and masks drawn from a
seeded space.  Complements the targeted kernel tests with breadth: any
(shape, τ, w, offset, mask) the wrappers accept must agree with the
reference math.

Interpret-mode only: every random (shape, τ, w) combination is a fresh
Mosaic compile, which via the remote-compile tunnel takes minutes per
case — the targeted kernel tests cover the compiled TPU path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.default_backend() == "tpu":
    pytest.skip(
        "fuzz sweep is interpret-mode only (per-case Mosaic compiles are "
        "minutes each on the remote-compile tunnel)",
        allow_module_level=True,
    )

from crossclr_tpu.losses import cross_clr_intra
from crossclr_tpu.losses.functional import l2_normalize
from crossclr_tpu.ops.fused_crossclr import cross_clr_intra_fused
from crossclr_tpu.ops.fused_global import fused_lse_rows
from crossclr_tpu.parallel.global_loss import (
    local_rows_cross_clr_intra,
    pruned_rows_global,
)

INTERPRET = True  # module skips on TPU above

# the interpreter accepts tiny tiles; batches below the compiled tiling
# minimum (64) exercise the kernels via an explicit TILE_OVERRIDE so the
# sweep never silently degenerates to jnp-vs-jnp
_BATCHES = (16, 40, 64)


@pytest.mark.parametrize("case", range(6))
def test_fuzz_intra_fused(case, rng):
    import crossclr_tpu.ops.fused_crossclr as fk

    r = np.random.default_rng(1000 + case)
    b = int(r.choice(_BATCHES))
    d = int(r.choice((16, 32, 100)))
    tau = float(r.uniform(0.02, 0.5))
    w = float(r.uniform(0.0, 1.0))
    v = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(r.standard_normal((b, d)), jnp.float32)

    def fused(v_, t_):
        return cross_clr_intra_fused(
            v_, t_, temperature=tau, negative_weight=w, interpret=INTERPRET
        )

    def ref(v_, t_):
        return cross_clr_intra(v_, t_, temperature=tau, negative_weight=w)

    small = max(s for s in (64, 32, 16, 8) if b % s == 0)
    fk.TILE_OVERRIDE = (small, small)
    try:
        fv, fg = jax.value_and_grad(fused, argnums=(0, 1))(v, t)
    finally:
        fk.TILE_OVERRIDE = None
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1))(v, t)
    np.testing.assert_allclose(float(fv), float(rv), rtol=3e-5, atol=3e-5)
    for g, wnt in zip(fg, rg):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=3e-4, atol=3e-5,
            err_msg=f"b={b} d={d} tau={tau:.3f} w={w:.3f}",
        )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_rect_rows(case, rng):
    r = np.random.default_rng(2000 + case)
    b_loc = int(r.choice(_BATCHES))
    n_blocks = int(r.integers(1, 5))
    n = b_loc * n_blocks
    d = int(r.choice((16, 32)))
    tau = float(r.uniform(0.02, 0.5))
    w = float(r.uniform(0.0, 1.0))
    block = int(r.integers(0, n_blocks))
    offset = block * b_loc
    pruned = bool(r.integers(0, 2))

    v_all = l2_normalize(jnp.asarray(r.standard_normal((n, d)), jnp.float32), 1)
    t_all = l2_normalize(jnp.asarray(r.standard_normal((n, d)), jnp.float32), 1)
    rows = v_all[offset : offset + b_loc]
    kw = dict(temperature=tau, negative_weight=w)
    if pruned:
        keep_i = jnp.asarray(r.random(n) > r.uniform(0.0, 0.4))
        keep_a = jnp.asarray(r.random(n) > r.uniform(0.0, 0.4))

        def fused(rows_, va, ta):
            return jnp.sum(
                fused_lse_rows(
                    rows_, va, ta, jnp.asarray(offset), interpret=INTERPRET,
                    keep_inter=keep_i, keep_intra=keep_a, **kw,
                )
            )

        def ref(rows_, va, ta):
            pos = jnp.sum(
                rows_ * jax.lax.dynamic_slice_in_dim(ta, offset, b_loc), axis=1
            ) / tau
            return jnp.sum(
                pruned_rows_global(rows_, ta, va, keep_i, keep_a, offset, **kw)
                + pos
            )
    else:

        def fused(rows_, va, ta):
            return jnp.sum(
                fused_lse_rows(
                    rows_, va, ta, jnp.asarray(offset),
                    interpret=INTERPRET, **kw,
                )
            )

        def ref(rows_, va, ta):
            pos = jnp.sum(
                rows_ * jax.lax.dynamic_slice_in_dim(ta, offset, b_loc), axis=1
            ) / tau
            return jnp.sum(
                local_rows_cross_clr_intra(rows_, va, ta, offset, **kw) + pos
            )

    fv, fg = jax.value_and_grad(fused, argnums=(0, 1, 2))(rows, v_all, t_all)
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1, 2))(rows, v_all, t_all)
    tag = f"b={b_loc} n={n} d={d} tau={tau:.3f} w={w:.3f} pruned={pruned}"
    np.testing.assert_allclose(float(fv), float(rv), rtol=3e-5, err_msg=tag)
    rtol, atol = (3e-4, 3e-5)
    for g, wnt in zip(fg, rg):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=rtol, atol=atol, err_msg=tag
        )


@pytest.mark.parametrize("case", range(6))
def test_fuzz_cross_clr_fused(case, rng):
    """Full CrossCLR through the pruned DUAL kernel route (b % 8 == 0 in
    interpret mode): random shapes, hyperparameters, and prune fractions
    vs losses.cross_clr — values and feature/temperature gradients."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.ops import cross_clr_fused

    r = np.random.default_rng(3000 + case)
    b = int(r.choice((16, 40, 64, 96)))
    d = int(r.choice((16, 32, 100)))
    tau0 = float(r.uniform(0.02, 0.5))
    w = float(r.uniform(0.0, 1.0))
    wt = float(r.uniform(0.001, 0.1))
    pp = float(r.choice((0.0, 0.1, 0.35)))
    v = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(r.standard_normal((b, d)), jnp.float32)
    vi = jnp.asarray(r.standard_normal((b, 24)), jnp.float32)
    ti = jnp.asarray(r.standard_normal((b, 20)), jnp.float32)
    kw = dict(negative_weight=w, weight_temperature=wt, prune_percent=pp)

    def fused(v_, t_, tau):
        return cross_clr_fused(
            v_, t_, vi, ti, temperature=tau, interpret=True, **kw
        )

    def ref(v_, t_, tau):
        return cross_clr(v_, t_, vi, ti, temperature=tau, **kw)

    tau = jnp.asarray(tau0, jnp.float32)
    fv, fg = jax.value_and_grad(fused, argnums=(0, 1, 2))(v, t, tau)
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1, 2))(v, t, tau)
    tag = f"b={b} d={d} tau={tau0:.3f} w={w:.3f} wt={wt:.4f} pp={pp}"
    np.testing.assert_allclose(float(fv), float(rv), rtol=3e-5, err_msg=tag)
    for g, wnt, name in zip(fg, rg, ("d_v", "d_t", "d_tau")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=3e-4, atol=3e-5,
            err_msg=f"{name} {tag}",
        )


@pytest.mark.parametrize("case", range(4))
def test_fuzz_sym_pruned(case, rng):
    """Static-τ full-CrossCLR masks through the SYMMETRIC static-max route
    (r5): auto tiles + static temperature inside the 2·m0 ≤ 80 gate make
    dual_lse_pair pick the sym-pruned kernels; every random (b, d, τ, w,
    mask draw) must match the −inf-masked jnp lse — values and gradients.
    """
    from crossclr_tpu.ops.fused_dual import dual_lse_pair, sym_supported

    r = np.random.default_rng(4000 + case)
    b = int(r.choice((64, 96, 128)))
    d = int(r.choice((16, 32, 100)))
    tau = float(r.uniform(0.026, 0.5))
    w = float(r.uniform(0.0, 1.0))
    v = l2_normalize(jnp.asarray(r.standard_normal((b, d)), jnp.float32), 1)
    t = l2_normalize(jnp.asarray(r.standard_normal((b, d)), jnp.float32), 1)
    keep_v = jnp.asarray(r.random(b) > r.uniform(0.0, 0.5))
    keep_t = jnp.asarray(r.random(b) > r.uniform(0.0, 0.5))
    assert sym_supported(b, d, 1.0 / tau, w, pruned=True)

    def ref(v_, t_):
        eye = jnp.eye(b, dtype=bool)
        ninf = -jnp.inf
        hi = jax.lax.Precision.HIGHEST

        def lse(anchor, other, keep_inter, keep_intra):
            inter = jnp.where(
                keep_inter[None] | eye,
                jnp.matmul(anchor, other.T, precision=hi) / tau, ninf,
            )
            intra = jnp.where(
                keep_intra[None] & ~eye,
                w * jnp.matmul(anchor, anchor.T, precision=hi) / tau, ninf,
            )
            return jax.scipy.special.logsumexp(
                jnp.concatenate([inter, intra], 1), axis=1
            )

        return jnp.sum(lse(v_, t_, keep_t, keep_v)) + 0.5 * jnp.sum(
            lse(t_, v_, keep_v, keep_t)
        )

    def fused(v_, t_):
        lv, lt = dual_lse_pair(
            v_, t_, temperature=tau, negative_weight=w, interpret=True,
            keep_video=keep_v, keep_text=keep_t,
        )
        return jnp.sum(lv) + 0.5 * jnp.sum(lt)

    tag = f"b={b} d={d} tau={tau:.3f} w={w:.3f}"
    fv, fg = jax.value_and_grad(fused, argnums=(0, 1))(v, t)
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1))(v, t)
    np.testing.assert_allclose(float(fv), float(rv), rtol=3e-5, err_msg=tag)
    for g, wnt, name in zip(fg, rg, ("d_v", "d_t")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=3e-4, atol=3e-5,
            err_msg=f"{name} {tag}",
        )
