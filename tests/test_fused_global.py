"""Direct unit tests for the rectangular global-negative kernels
(ops/fused_global.py), run through the Pallas interpreter on CPU.

The invariant: for local rows at offset k·b_loc of a global batch,
``fused_lse_rows`` equals the lse implied by the jnp row-block reference
(parallel.global_loss.local_rows_cross_clr_intra), and its three-way
custom VJP matches autodiff of that reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crossclr_tpu.losses.functional import l2_normalize
from crossclr_tpu.ops.fused_global import fused_lse_rows, rows_supported
from crossclr_tpu.parallel.global_loss import local_rows_cross_clr_intra

ON_TPU = jax.default_backend() == "tpu"
INTERPRET = not ON_TPU


# shapes must satisfy the compiled kernel's minimum 64-wide tiles so the
# suite also passes with CROSSCLR_TESTS_BACKEND=tpu (interpret mode on CPU
# would accept smaller)
def _setup(rng, b_loc=64, b_glob=256, d=32):
    v_all = l2_normalize(
        jnp.asarray(rng.standard_normal((b_glob, d)), jnp.float32), 1
    )
    t_all = l2_normalize(
        jnp.asarray(rng.standard_normal((b_glob, d)), jnp.float32), 1
    )
    return v_all, t_all, b_loc


def _ref_lse(rows, v_all, t_all, offset, temperature=0.03, negative_weight=0.8):
    """lse = per-row loss + positive logit (reference math)."""
    loss_rows = local_rows_cross_clr_intra(
        rows, v_all, t_all, offset,
        temperature=temperature, negative_weight=negative_weight,
    )
    pos = (
        jnp.sum(rows * jax.lax.dynamic_slice_in_dim(t_all, offset, rows.shape[0]), axis=1)
        / temperature
    )
    return loss_rows + pos


@pytest.mark.parametrize("block", [0, 1, 3])
def test_lse_matches_reference_at_offsets(rng, block):
    v_all, t_all, b_loc = _setup(rng)
    offset = block * b_loc
    rows = v_all[offset : offset + b_loc]
    want = _ref_lse(rows, v_all, t_all, offset)
    got = fused_lse_rows(
        rows, v_all, t_all, jnp.asarray(offset), interpret=INTERPRET
    )[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_three_way_gradients_match_autodiff(rng):
    v_all, t_all, b_loc = _setup(rng, b_loc=64, b_glob=256, d=16)
    offset = 2 * b_loc
    rows = v_all[offset : offset + b_loc]

    def fused_sum(r, va, ta):
        return jnp.sum(
            fused_lse_rows(r, va, ta, jnp.asarray(offset), interpret=INTERPRET)
        )

    def ref_sum(r, va, ta):
        # HIGHEST precision: plain @ would run bf16 passes on the TPU MXU
        # and the comparison would measure the reference's error, not the
        # kernel's
        hp = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        inter = hp(r, ta.T) / 0.03
        intra = 0.8 * hp(r, va.T) / 0.03
        ids_r = offset + jnp.arange(r.shape[0])[:, None]
        ids_c = jnp.arange(va.shape[0])[None, :]
        intra = jnp.where(ids_r == ids_c, 0.0, intra)
        cand = jnp.concatenate([inter, intra], axis=1)
        return jnp.sum(jax.scipy.special.logsumexp(cand, axis=1))

    got = jax.grad(fused_sum, argnums=(0, 1, 2))(rows, v_all, t_all)
    want = jax.grad(ref_sum, argnums=(0, 1, 2))(rows, v_all, t_all)
    # compiled Mosaic lowers exp to the VPU transcendental (~1e-5 rel vs
    # XLA's exp); rematerializing softmax tiles from lse at logit scale
    # 1/τ amplifies that to ~1e-3 rel on small entries.  Interpret mode
    # runs XLA ops and matches tightly.
    rtol, atol = (2e-3, 5e-5) if ON_TPU else (2e-4, 2e-5)
    for g, w, name in zip(got, want, ("d_rows", "d_v_all", "d_t_all")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol, err_msg=name
        )


def test_traced_temperature_gradient_matches_autodiff(rng):
    """τ as a traced scalar: the kernels' hand-written dτ (per-row Σ p⊙z
    accumulation / s) matches autodiff of the jnp row-block formulation —
    the exactness gate for learnable temperature on the GLOBAL fused path."""
    v_all, t_all, b_loc = _setup(rng, b_loc=64, b_glob=256, d=16)
    offset = b_loc
    rows = v_all[offset : offset + b_loc]

    def fused_sum(tau, r, va, ta):
        return jnp.sum(
            fused_lse_rows(
                r, va, ta, jnp.asarray(offset),
                temperature=tau, interpret=INTERPRET,
            )
        )

    def ref_sum(tau, r, va, ta):
        hp = lambda a, b: jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)
        inter = hp(r, ta.T) / tau
        intra = 0.8 * hp(r, va.T) / tau
        ids_r = offset + jnp.arange(r.shape[0])[:, None]
        ids_c = jnp.arange(va.shape[0])[None, :]
        intra = jnp.where(ids_r == ids_c, 0.0, intra)
        cand = jnp.concatenate([inter, intra], axis=1)
        return jnp.sum(jax.scipy.special.logsumexp(cand, axis=1))

    tau = jnp.asarray(0.07, jnp.float32)
    got = jax.grad(fused_sum, argnums=(0, 1, 2, 3))(tau, rows, v_all, t_all)
    want = jax.grad(ref_sum, argnums=(0, 1, 2, 3))(tau, rows, v_all, t_all)
    rtol, atol = (2e-3, 5e-5) if ON_TPU else (2e-4, 2e-5)
    for g, w, name in zip(got, want, ("d_tau", "d_rows", "d_v_all", "d_t_all")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol, err_msg=name
        )


def test_pruned_masks_match_jnp_reference(rng):
    """The PRUNED variant (full-CrossCLR semantics: influential negatives
    and the self column dropped, positive diagonal always kept) matches
    parallel.global_loss.pruned_rows_global — forward, all three feature
    gradients, AND dτ."""
    from crossclr_tpu.parallel.global_loss import pruned_rows_global

    v_all, t_all, b_loc = _setup(rng, b_loc=64, b_glob=256, d=16)
    keep_i = jnp.asarray(rng.random(256) > 0.15)
    keep_a = jnp.asarray(rng.random(256) > 0.15)
    offset = 2 * b_loc
    rows = v_all[offset : offset + b_loc]

    def fused(tau, r, va, ta):
        lse = fused_lse_rows(
            r, va, ta, jnp.asarray(offset), temperature=tau,
            interpret=INTERPRET, keep_inter=keep_i, keep_intra=keep_a,
        )[:, 0]
        pos = jnp.sum(
            r * jax.lax.dynamic_slice_in_dim(ta, offset, b_loc), axis=1
        ) / tau
        return jnp.sum(lse - pos)

    def ref(tau, r, va, ta):
        return jnp.sum(
            pruned_rows_global(
                r, ta, va, keep_i, keep_a, offset,
                temperature=tau, negative_weight=0.8,
            )
        )

    tau = jnp.asarray(0.05, jnp.float32)
    fv, fg = jax.value_and_grad(fused, argnums=(0, 1, 2, 3))(tau, rows, v_all, t_all)
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1, 2, 3))(tau, rows, v_all, t_all)
    np.testing.assert_allclose(float(fv), float(rv), rtol=2e-5)
    # compiled Mosaic's VPU exp is ~1e-5 rel off XLA's; rematerializing
    # softmax from lse at logit scale 1/τ amplifies that to ~1e-3 rel on
    # small gradient entries (see test_three_way_gradients_match_autodiff)
    # — the τ=0.05 pruned case lands the odd element just past 2e-3
    rtol, atol = (4e-3, 5e-5) if ON_TPU else (2e-4, 2e-5)
    for g, w, name in zip(fg, rg, ("d_tau", "d_rows", "d_v_all", "d_t_all")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol, err_msg=name
        )


def test_cross_clr_fused_matches_jnp(rng):
    """ops.cross_clr_fused (pruned kernels at offset 0) == losses.cross_clr
    on the same batch — values and gradients, including the raw-input
    connectivity path."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.ops import cross_clr_fused

    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    vi = jnp.asarray(rng.standard_normal((b, 40)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((b, 24)), jnp.float32)

    def fused(a, b_):
        return cross_clr_fused(a, b_, vi, ti, interpret=INTERPRET)

    def ref(a, b_):
        return cross_clr(a, b_, vi, ti)

    fv, fg = jax.value_and_grad(fused, argnums=(0, 1))(v, t)
    rv, rg = jax.value_and_grad(ref, argnums=(0, 1))(v, t)
    np.testing.assert_allclose(float(fv), float(rv), rtol=2e-5)
    rtol, atol = (2e-3, 5e-5) if ON_TPU else (2e-4, 2e-5)
    for g, w, name in zip(fg, rg, ("d_v", "d_t")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol, err_msg=name
        )


def test_pruned_mask_edge_cases(rng):
    """All-kept masks equal the unmasked pruned-jnp path; all-pruned masks
    leave only the positive in each row (lse == positive logit, so the
    per-row loss is exactly 0)."""
    from crossclr_tpu.parallel.global_loss import pruned_rows_global

    v_all, t_all, b_loc = _setup(rng, b_loc=64, b_glob=256, d=16)
    rows = v_all[:b_loc]
    ones = jnp.ones((256,), bool)
    zeros = jnp.zeros((256,), bool)

    got_all = fused_lse_rows(
        rows, v_all, t_all, jnp.asarray(0), interpret=INTERPRET,
        keep_inter=ones, keep_intra=ones,
    )[:, 0]
    want_all = pruned_rows_global(
        rows, t_all, v_all, ones, ones, 0,
        temperature=0.03, negative_weight=0.8,
    ) + jnp.sum(rows * t_all[:b_loc], axis=1) / 0.03
    np.testing.assert_allclose(
        np.asarray(got_all), np.asarray(want_all), rtol=2e-5, atol=2e-5
    )

    got_none = fused_lse_rows(
        rows, v_all, t_all, jnp.asarray(0), interpret=INTERPRET,
        keep_inter=zeros, keep_intra=zeros,
    )[:, 0]
    pos = jnp.sum(rows * t_all[:b_loc], axis=1) / 0.03
    np.testing.assert_allclose(
        np.asarray(got_none), np.asarray(pos), rtol=2e-5, atol=2e-5
    )

    # same with a NONZERO offset: the fully-masked tiles now come BEFORE
    # the tile holding the positive diagonal — pins the all-masked-prefix
    # accumulation path (the bogus exp(0) terms of those tiles must be
    # wiped by the online-max rescale once the kept positive arrives; see
    # the _MASKED comment in fused_global.py — a finite max floor is NOT
    # a valid alternative)
    offset = 2 * b_loc
    rows2 = v_all[offset : offset + b_loc]
    got_off = fused_lse_rows(
        rows2, v_all, t_all, jnp.asarray(offset), interpret=INTERPRET,
        keep_inter=zeros, keep_intra=zeros,
    )[:, 0]
    pos2 = jnp.sum(rows2 * t_all[offset : offset + b_loc], axis=1) / 0.03
    np.testing.assert_allclose(
        np.asarray(got_off), np.asarray(pos2), rtol=2e-5, atol=2e-5
    )


def test_mask_arg_validation(rng):
    v_all, t_all, b_loc = _setup(rng)
    with pytest.raises(ValueError, match="both keep masks"):
        fused_lse_rows(
            v_all[:b_loc], v_all, t_all, jnp.asarray(0), interpret=INTERPRET,
            keep_inter=jnp.ones((256,), bool),
        )


def test_nondefault_hparams(rng):
    v_all, t_all, b_loc = _setup(rng)
    rows = v_all[:b_loc]
    want = _ref_lse(rows, v_all, t_all, 0, temperature=0.2, negative_weight=0.3)
    got = fused_lse_rows(
        rows, v_all, t_all, jnp.asarray(0),
        temperature=0.2, negative_weight=0.3, interpret=INTERPRET,
    )[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_unsupported_shape_raises(rng):
    v_all, t_all, _ = _setup(rng, b_glob=256)
    rows = v_all[:10]  # 10 not divisible by any tile
    with pytest.raises(ValueError):
        fused_lse_rows(rows, v_all, t_all, jnp.asarray(0), interpret=False)
    assert not rows_supported(10, 256, 32)


def test_feature_dim_padding(rng):
    """d=100 (not lane-aligned) is zero-padded; results identical."""
    v_all, t_all, b_loc = _setup(rng, d=100)
    rows = v_all[:b_loc]
    want = _ref_lse(rows, v_all, t_all, 0)
    got = fused_lse_rows(rows, v_all, t_all, jnp.asarray(0), interpret=INTERPRET)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_cross_clr_fused_traced_temperature(rng):
    """Learnable τ through the pruned DUAL kernel: d/dτ of cross_clr_fused
    matches autodiff of losses.cross_clr (the ds accumulation must pair
    each role's coefficients with its own masked logits)."""
    from crossclr_tpu.losses import cross_clr
    from crossclr_tpu.ops import cross_clr_fused

    b, d = 64, 32
    v = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)

    def fused(tau):
        return cross_clr_fused(v, t, temperature=tau, interpret=INTERPRET)

    def ref(tau):
        return cross_clr(v, t, temperature=tau)

    tau = jnp.asarray(0.07, jnp.float32)
    fv, fd = jax.value_and_grad(fused)(tau)
    rv, rd = jax.value_and_grad(ref)(tau)
    np.testing.assert_allclose(float(fv), float(rv), rtol=2e-5)
    rtol = 2e-3 if ON_TPU else 2e-4
    np.testing.assert_allclose(float(fd), float(rd), rtol=rtol)


def test_pruned_extreme_temperature_stays_finite(rng):
    """Review regression: at extreme scales (1/τ = 2e4) a row whose only
    kept candidate (its positive) has strongly negative similarity must
    still produce a finite lse equal to the positive logit — a finite
    online-max floor above _MASKED silently turned this into −inf."""
    b, d = 8, 16
    v = l2_normalize(jnp.asarray(rng.standard_normal((b, d)), jnp.float32), 1)
    t = jnp.asarray(-np.asarray(v))  # cos(v_i, t_i) = -1 exactly
    zeros = jnp.zeros((b,), bool)
    tau = 5e-5  # scale 2e4: genuine logits at -2e4, far below any floor
    got = fused_lse_rows(
        v, v, t, jnp.asarray(0), temperature=tau, interpret=True,
        keep_inter=zeros, keep_intra=zeros,
    )[:, 0]
    want = jnp.sum(v * t, axis=1) / tau  # = -2e4 per row
    assert np.all(np.isfinite(np.asarray(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
