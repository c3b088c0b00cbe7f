"""Numerical parity of the jnp losses vs the torch CPU oracle.

BASELINE.json config 1: CrossCLR_onlyIntraModality on random [256, 512]
video/text features, fp32 tolerance — forward value AND input gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

pytestmark = pytest.mark.quick

from crossclr_tpu.losses import (
    CrossCLR_onlyIntraModality,
    MaxMarginCoot,
    cross_clr_intra,
    max_margin,
)
from tests.reference_oracle import oracle_crossclr_intra, oracle_max_margin


def _pair(rng, b, d, scale=1.0):
    v = (rng.standard_normal((b, d)) * scale).astype(np.float32)
    t = (rng.standard_normal((b, d)) * scale).astype(np.float32)
    return v, t


@pytest.mark.parametrize("b,d", [(2, 8), (8, 16), (64, 32), (256, 512)])
def test_forward_parity_default_hparams(rng, b, d):
    v, t = _pair(rng, b, d)
    got = float(cross_clr_intra(jnp.asarray(v), jnp.asarray(t)))
    want = float(oracle_crossclr_intra(torch.from_numpy(v), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "temperature,negative_weight",
    [(0.03, 0.8), (0.1, 0.8), (0.03, 0.0), (0.5, 1.0), (1.0, 0.3)],
)
def test_forward_parity_hparam_sweep(rng, temperature, negative_weight):
    v, t = _pair(rng, 32, 24)
    got = float(
        cross_clr_intra(
            jnp.asarray(v),
            jnp.asarray(t),
            temperature=temperature,
            negative_weight=negative_weight,
        )
    )
    want = float(
        oracle_crossclr_intra(
            torch.from_numpy(v),
            torch.from_numpy(t),
            temperature=temperature,
            negative_weight=negative_weight,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradient_parity(rng):
    v, t = _pair(rng, 48, 40)
    gv, gt = jax.grad(lambda a, b: cross_clr_intra(a, b), argnums=(0, 1))(
        jnp.asarray(v), jnp.asarray(t)
    )

    tv = torch.from_numpy(v).requires_grad_(True)
    tt = torch.from_numpy(t).requires_grad_(True)
    oracle_crossclr_intra(tv, tt).backward()

    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_criterion_class_matches_functional(rng):
    v, t = _pair(rng, 16, 8)
    crit = CrossCLR_onlyIntraModality(temperature=0.07, negative_weight=0.5)
    a = float(crit(jnp.asarray(v), jnp.asarray(t)))
    b = float(
        cross_clr_intra(
            jnp.asarray(v), jnp.asarray(t), temperature=0.07, negative_weight=0.5
        )
    )
    assert a == b
    # vestigial parity param exists and is a scalar (loss.py:52)
    assert crit.logit_scale.shape == ()
    assert crit.params()["logit_scale"].shape == ()


def test_criterion_accepts_unused_logger(rng):
    v, t = _pair(rng, 4, 8)
    crit = CrossCLR_onlyIntraModality(logger=object())
    assert np.isfinite(float(crit(jnp.asarray(v), jnp.asarray(t))))


def test_zeroed_diagonal_quirk_preserved(rng):
    """The denominator must carry the spurious exp(0)=1 term (SURVEY §2.2
    step 5): an exclusion-semantics implementation gives a smaller loss."""
    v, t = _pair(rng, 8, 16)
    got = float(cross_clr_intra(jnp.asarray(v), jnp.asarray(t)))

    # exclusion-semantics variant computed inline
    vj = jnp.asarray(v) / jnp.linalg.norm(jnp.asarray(v), axis=1, keepdims=True)
    tj = jnp.asarray(t) / jnp.linalg.norm(jnp.asarray(t), axis=1, keepdims=True)

    def direction(inter, intra):
        b = inter.shape[0]
        eye = jnp.eye(b, dtype=bool)
        cand = jnp.concatenate(
            [inter / 0.03, jnp.where(eye, -jnp.inf, 0.8 * intra / 0.03)], axis=1
        )
        return jnp.mean(jax.scipy.special.logsumexp(cand, axis=1) - jnp.diagonal(inter) / 0.03)

    excl = float(
        (direction(vj @ tj.T, vj @ vj.T) + direction(tj @ vj.T, tj @ tj.T)) / 2
    )
    assert got > excl  # extra exp(0) strictly inflates every denominator


@pytest.mark.parametrize("b,d", [(8, 16), (32, 64)])
def test_max_margin_parity(rng, b, d):
    v, t = _pair(rng, b, d)
    got = float(max_margin(jnp.asarray(v), jnp.asarray(t)))
    want = float(oracle_max_margin(torch.from_numpy(v), torch.from_numpy(t)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_max_margin_gradient_parity(rng):
    v, t = _pair(rng, 16, 8)
    gv, gt = jax.grad(lambda a, b: max_margin(a, b), argnums=(0, 1))(
        jnp.asarray(v), jnp.asarray(t)
    )
    tv = torch.from_numpy(v).requires_grad_(True)
    tt = torch.from_numpy(t).requires_grad_(True)
    oracle_max_margin(tv, tt).backward()
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt), tt.grad.numpy(), rtol=1e-4, atol=1e-6)


def test_max_margin_criterion_class_signature(rng):
    v, t = _pair(rng, 8, 8)
    # use_cuda accepted-and-ignored for reference signature parity
    crit = MaxMarginCoot(use_cuda=False, margin=0.2)
    got = float(crit(jnp.asarray(v), jnp.asarray(t)))
    want = float(
        oracle_max_margin(torch.from_numpy(v), torch.from_numpy(t), margin=0.2)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_criterion_backend_fused_matches_jnp(rng):
    v, t = _pair(rng, 64, 32)
    jnp_val = float(
        CrossCLR_onlyIntraModality(backend="jnp")(jnp.asarray(v), jnp.asarray(t))
    )
    # off-TPU the fused backend transparently falls back to the jnp path
    fused_val = float(
        CrossCLR_onlyIntraModality(backend="fused")(jnp.asarray(v), jnp.asarray(t))
    )
    np.testing.assert_allclose(fused_val, jnp_val, rtol=2e-5)
    with pytest.raises(ValueError):
        CrossCLR_onlyIntraModality(backend="nope")
