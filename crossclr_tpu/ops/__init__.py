"""Pallas TPU kernels with jnp fallbacks."""

from .fused_crossclr import (
    cross_clr_intra_fused,
    fused_lse_pair,
    pallas_supported,
)
from .fused_dual import dual_lse_pair, dual_supported
from .fused_global import cross_clr_fused, fused_lse_rows, rows_supported
from .flash_attention import flash_attention, flash_supported, mha_reference

__all__ = [
    "cross_clr_intra_fused",
    "cross_clr_fused",
    "fused_lse_pair",
    "fused_lse_rows",
    "pallas_supported",
    "rows_supported",
    "dual_lse_pair",
    "dual_supported",
    "flash_attention",
    "flash_supported",
    "mha_reference",
]
