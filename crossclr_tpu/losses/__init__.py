"""CrossCLR losses: functional jnp core + reference-API criterion classes."""

from .functional import (
    connectivity_scores,
    cosine_sim,
    cross_clr,
    cross_clr_intra,
    cross_clr_intra_per_row,
    info_nce,
    l2_normalize,
    max_margin,
)
from .criterion import (
    CrossCLR,
    CrossCLR_onlyIntraModality,
    InfoNCE,
    MaxMarginCoot,
)

__all__ = [
    "connectivity_scores",
    "cosine_sim",
    "cross_clr",
    "cross_clr_intra",
    "cross_clr_intra_per_row",
    "info_nce",
    "l2_normalize",
    "max_margin",
    "CrossCLR",
    "CrossCLR_onlyIntraModality",
    "InfoNCE",
    "MaxMarginCoot",
]
