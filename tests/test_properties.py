"""Property tests for the loss family (SURVEY.md §4 item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick

from crossclr_tpu.losses import (
    connectivity_scores,
    cross_clr,
    cross_clr_intra,
    info_nce,
    l2_normalize,
    max_margin,
)


def _pair(rng, b=16, d=32):
    return (
        jnp.asarray(rng.standard_normal((b, d)), dtype=jnp.float32),
        jnp.asarray(rng.standard_normal((b, d)), dtype=jnp.float32),
    )


def test_scale_invariance(rng):
    """Pre-normalization makes the loss invariant to per-sample scaling."""
    v, t = _pair(rng)
    base = cross_clr_intra(v, t)
    scales = jnp.asarray(rng.uniform(0.1, 10.0, size=(v.shape[0], 1)), jnp.float32)
    scaled = cross_clr_intra(v * scales, t * 7.3)
    np.testing.assert_allclose(float(base), float(scaled), rtol=1e-4)


def test_batch_permutation_equivariance(rng):
    """Permuting (video, text) pairs together leaves the loss unchanged."""
    v, t = _pair(rng)
    perm = jnp.asarray(np.random.default_rng(1).permutation(v.shape[0]))
    base = cross_clr_intra(v, t)
    permuted = cross_clr_intra(v[perm], t[perm])
    np.testing.assert_allclose(float(base), float(permuted), rtol=1e-5)


def test_negative_weight_zero_equals_padded_infonce(rng):
    """With w=0 the intra block contributes B exp(0)=1 terms per row; the
    loss equals InfoNCE with B ones appended to each denominator."""
    v, t = _pair(rng, b=8, d=16)
    got = cross_clr_intra(v, t, negative_weight=0.0)

    vn, tn = l2_normalize(v, 1), l2_normalize(t, 1)
    hp = lambda a, b_: jnp.matmul(a, b_, precision=jax.lax.Precision.HIGHEST)

    def padded_infonce(inter):
        b = inter.shape[0]
        cand = jnp.concatenate([inter, jnp.zeros((b, b))], axis=1)
        return jnp.mean(
            jax.scipy.special.logsumexp(cand, axis=1) - jnp.diagonal(inter)
        )

    want = (
        padded_infonce(hp(vn, tn.T) / 0.03) + padded_infonce(hp(tn, vn.T) / 0.03)
    ) / 2
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_loss_decreases_with_alignment(rng):
    """Perfectly aligned pairs score lower than random pairs."""
    v, t = _pair(rng, b=32, d=64)
    random_loss = cross_clr_intra(v, t)
    aligned_loss = cross_clr_intra(v, v)  # text == video: positives at sim 1
    assert float(aligned_loss) < float(random_loss)


def test_loss_is_finite_and_positive(rng):
    v, t = _pair(rng)
    loss = cross_clr_intra(v, t)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_jit_matches_eager(rng):
    v, t = _pair(rng)
    eager = cross_clr_intra(v, t)
    jitted = jax.jit(cross_clr_intra)(v, t)
    np.testing.assert_allclose(float(eager), float(jitted), rtol=1e-6)


def test_grad_is_finite(rng):
    v, t = _pair(rng)
    gv, gt = jax.grad(lambda a, b: cross_clr_intra(a, b), argnums=(0, 1))(v, t)
    assert np.all(np.isfinite(np.asarray(gv)))
    assert np.all(np.isfinite(np.asarray(gt)))


def test_bf16_inputs_close_to_fp32(rng):
    v, t = _pair(rng, b=64, d=128)
    f32 = float(cross_clr_intra(v, t))
    bf16 = float(cross_clr_intra(v.astype(jnp.bfloat16), t.astype(jnp.bfloat16)))
    np.testing.assert_allclose(bf16, f32, rtol=2e-2)


# ---- full CrossCLR ----


def test_connectivity_scores_range(rng):
    x = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    c = connectivity_scores(x)
    assert c.shape == (16,)
    assert np.all(np.asarray(c) >= -1.0) and np.all(np.asarray(c) <= 1.0)


def test_connectivity_high_for_duplicated_sample(rng):
    x = np.asarray(rng.standard_normal((8, 16)), np.float32)
    x[1] = x[0]  # duplicated sample pair is maximally connected to each other
    c = np.asarray(connectivity_scores(jnp.asarray(x)))
    assert c[0] > np.median(c) - 1e-6


def test_cross_clr_defaults_to_embeddings_for_scoring(rng):
    v, t = _pair(rng)
    two_arg = cross_clr(v, t)
    four_arg = cross_clr(v, t, v, t)
    np.testing.assert_allclose(float(two_arg), float(four_arg), rtol=1e-6)


def test_cross_clr_finite_and_jittable(rng):
    v, t = _pair(rng, b=32)
    vi = jnp.asarray(rng.standard_normal((32, 20)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((32, 24)), jnp.float32)
    loss = jax.jit(cross_clr)(v, t, vi, ti)
    assert np.isfinite(float(loss))
    grads = jax.grad(lambda a, b: cross_clr(a, b, vi, ti), argnums=(0, 1))(v, t)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_cross_clr_no_prune_uniform_weights_reduces_cleanly(rng):
    """prune=0 and a huge weight-temperature (→ uniform weights) gives the
    plain inter+intra loss with exclusion semantics."""
    v, t = _pair(rng, b=8, d=16)
    got = cross_clr(
        v, t, prune_percent=0.0, weight_temperature=1e9, negative_weight=0.8
    )
    assert np.isfinite(float(got))
    # uniform-weight version must be permutation invariant too
    perm = jnp.asarray(np.random.default_rng(3).permutation(8))
    got_p = cross_clr(
        v[perm], t[perm], prune_percent=0.0, weight_temperature=1e9
    )
    np.testing.assert_allclose(float(got), float(got_p), rtol=1e-5)


def test_cross_clr_pruning_reduces_denominator(rng):
    """Pruning negatives can only shrink each row's denominator, so the
    unweighted pruned loss is ≤ the unpruned loss."""
    v, t = _pair(rng, b=32, d=16)
    unpruned = cross_clr(v, t, prune_percent=0.0, weight_temperature=1e9)
    pruned = cross_clr(v, t, prune_percent=0.25, weight_temperature=1e9)
    assert float(pruned) <= float(unpruned) + 1e-6


def test_max_margin_zero_for_well_separated(rng):
    """Orthonormal embeddings with identical pairing: all off-diagonal
    similarities are 0, diagonal is 1 ⇒ hinge at margin<1 is inactive."""
    eye = jnp.eye(8, dtype=jnp.float32)
    loss = max_margin(eye, eye, margin=0.1)
    np.testing.assert_allclose(float(loss), 0.0, atol=1e-7)


def test_info_nce_perfect_alignment_bound(rng):
    v = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    aligned = info_nce(v, v, temperature=0.01)
    shuffled = info_nce(v, v[::-1], temperature=0.01)
    assert float(aligned) < float(shuffled)


def test_cross_clr_sequence_inputs_pooled(rng):
    """Raw [B, S, D] sequence features (transformer-tower batches) are
    mean-pooled for connectivity scoring instead of crashing."""
    v, t = _pair(rng, b=16, d=32)
    vi = jnp.asarray(rng.standard_normal((16, 5, 12)), jnp.float32)
    ti = jnp.asarray(rng.standard_normal((16, 3, 8)), jnp.float32)
    loss = cross_clr(v, t, vi, ti)
    assert np.isfinite(float(loss))
    # pooling equivalence: pre-pooled inputs give the identical loss
    pooled = cross_clr(v, t, jnp.mean(vi, axis=1), jnp.mean(ti, axis=1))
    np.testing.assert_allclose(float(loss), float(pooled), rtol=1e-6)


def test_connectivity_scores_are_gradient_stopped(rng):
    """Influence scores must not be a gradient channel (paper: fixed input
    statistics) — grads through cross_clr's weighting are zero w.r.t. the
    scoring features."""
    v, t = _pair(rng, b=8, d=16)

    def loss_via_scores(x):
        return cross_clr(v, t, x, x)

    x0 = jnp.asarray(np.random.default_rng(9).standard_normal((8, 16)), jnp.float32)
    g = jax.grad(loss_via_scores)(x0)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
