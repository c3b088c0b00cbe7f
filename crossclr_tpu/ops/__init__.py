"""Pallas TPU kernels with jnp fallbacks."""

from .fused_crossclr import (
    cross_clr_intra_fused,
    fused_lse_pair,
    pallas_supported,
)

__all__ = ["cross_clr_intra_fused", "fused_lse_pair", "pallas_supported"]
