"""Criterion classes mirroring the reference's public API surface.

The reference's entire intended API (README.md:24-38) is::

    criterion = CrossCLR_onlyIntraModality(temperature, negative_weight)
    loss = criterion(video_features, text_features)

These wrappers preserve that call signature over the functional jnp core.
They are plain Python callables (not Flax modules): the loss has no
*useful* state — the reference's ``logit_scale = nn.Parameter(ones([]))``
(loss.py:52) and ``self.criterion = CrossEntropyLoss`` (loss.py:53) are
both dead in ``forward``.  We still expose ``logit_scale`` (and a
``params()`` helper) so training loops that registered the criterion's
parameters with the optimizer — as the reference's implied loop does —
have an equivalent hook.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from . import functional as F

__all__ = [
    "CrossCLR_onlyIntraModality",
    "CrossCLR",
    "MaxMarginCoot",
    "InfoNCE",
]


class _Criterion:
    """Shared base: holds hyperparameters, delegates __call__ to a pure fn."""

    def __call__(self, *args, **kwargs):  # pragma: no cover - overridden
        raise NotImplementedError

    def params(self) -> dict[str, jax.Array]:
        """Trainable parameters of the criterion (may be empty/vestigial)."""
        return {}


class CrossCLR_onlyIntraModality(_Criterion):
    """CrossCLR loss, intra-modality-negatives variant (parity class).

    Mirrors ``CrossCLR_onlyIntraModality`` (loss.py:44-113): defaults
    τ=0.03, w=0.8, unused ``logger`` kwarg, and a vestigial trainable
    ``logit_scale`` scalar (loss.py:52) that never enters the math.

    ``backend``: "jnp" (default — parity path), "fused" (Pallas kernel on
    TPU, jnp fallback elsewhere), or "fused_fast" (Pallas at training
    precision — forward stays inside fp32 tolerance, gradients ~1e-3 rel).
    """

    def __init__(
        self,
        temperature: float = 0.03,
        negative_weight: float = 0.8,
        logger: Any = None,
        backend: str = "jnp",
    ):
        self.temperature = float(temperature)
        self.negative_w = float(negative_weight)
        self.logger = logger  # accepted and unused, like loss.py:55
        self.logit_scale = jnp.ones(())  # vestigial parity param (loss.py:52)
        if backend not in ("jnp", "fused", "fused_fast"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend

    def params(self) -> dict[str, jax.Array]:
        return {"logit_scale": self.logit_scale}

    def __call__(self, video_features: jax.Array, text_features: jax.Array) -> jax.Array:
        if self.backend != "jnp":
            from ..ops import cross_clr_intra_fused

            return cross_clr_intra_fused(
                video_features,
                text_features,
                temperature=self.temperature,
                negative_weight=self.negative_w,
                precision="default" if self.backend == "fused_fast" else None,
            )
        return F.cross_clr_intra(
            video_features,
            text_features,
            temperature=self.temperature,
            negative_weight=self.negative_w,
        )


class CrossCLR(_Criterion):
    """Full CrossCLR: inter+intra negatives, influential-sample pruning,
    connectivity-weighted positives (paper arXiv 2109.14910; absent from the
    released reference file — see SURVEY.md §2.3).

    ``forward`` accepts optional raw input features for connectivity
    scoring; with only embeddings the two-argument reference signature
    still works (scores fall back to the embeddings).
    """

    def __init__(
        self,
        temperature: float = 0.03,
        negative_weight: float = 0.8,
        weight_temperature: float = 0.0035,
        prune_percent: float = 0.10,
        weight_norm: str = "raw",
        logger: Any = None,
    ):
        self.temperature = float(temperature)
        self.negative_w = float(negative_weight)
        self.weight_temperature = float(weight_temperature)
        self.prune_percent = float(prune_percent)
        self.weight_norm = str(weight_norm)
        self.logger = logger
        self.logit_scale = jnp.ones(())

    def params(self) -> dict[str, jax.Array]:
        return {"logit_scale": self.logit_scale}

    def __call__(
        self,
        video_features: jax.Array,
        text_features: jax.Array,
        video_inputs: jax.Array | None = None,
        text_inputs: jax.Array | None = None,
    ) -> jax.Array:
        return F.cross_clr(
            video_features,
            text_features,
            video_inputs,
            text_inputs,
            temperature=self.temperature,
            negative_weight=self.negative_w,
            weight_temperature=self.weight_temperature,
            prune_percent=self.prune_percent,
            weight_norm=self.weight_norm,
        )


class MaxMarginCoot(_Criterion):
    """COOT max-margin ranking criterion — the working version of
    ``MaxMargin_coot`` (loss.py:17-41, shipped with a fatal NameError at
    loss.py:24).  ``use_cuda`` is accepted for signature parity and ignored:
    device placement is JAX's job, not the criterion's.
    """

    def __init__(self, use_cuda: bool = False, margin: float = 0.1):
        del use_cuda
        self.margin = float(margin)

    def __call__(self, im: jax.Array, s: jax.Array) -> jax.Array:
        return F.max_margin(im, s, margin=self.margin)


class InfoNCE(_Criterion):
    """Plain symmetric InfoNCE (CLIP-style) for ablations."""

    def __init__(self, temperature: float = 0.03):
        self.temperature = float(temperature)

    def __call__(self, video_features: jax.Array, text_features: jax.Array) -> jax.Array:
        return F.info_nce(
            video_features, text_features, temperature=self.temperature
        )
