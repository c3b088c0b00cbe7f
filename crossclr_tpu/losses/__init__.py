"""CrossCLR losses: functional jnp core + reference-API criterion classes."""

from .functional import (
    connectivity_keep_and_weights,
    connectivity_scores,
    cosine_sim,
    cross_clr,
    cross_clr_intra,
    cross_clr_intra_per_row,
    info_nce,
    l2_normalize,
    max_margin,
    normalized_connectivity,
    weight_effective_fraction,
)
from .criterion import (
    CrossCLR,
    CrossCLR_onlyIntraModality,
    InfoNCE,
    MaxMarginCoot,
)

__all__ = [
    "connectivity_keep_and_weights",
    "connectivity_scores",
    "cosine_sim",
    "cross_clr",
    "cross_clr_intra",
    "cross_clr_intra_per_row",
    "info_nce",
    "l2_normalize",
    "max_margin",
    "normalized_connectivity",
    "weight_effective_fraction",
    "CrossCLR",
    "CrossCLR_onlyIntraModality",
    "InfoNCE",
    "MaxMarginCoot",
]
