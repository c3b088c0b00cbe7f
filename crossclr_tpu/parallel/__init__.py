"""Mesh construction and distributed (global-negative) loss wrappers."""

from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated_sharding
from .global_loss import (
    global_cross_clr,
    global_cross_clr_intra,
    local_rows_cross_clr_intra,
    pruned_rows_global,
)
from .multihost import host_local_batch_size, initialize_multihost, is_multihost
from .ring_attention import ring_attention, sequence_parallel_attention

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "data_sharding",
    "make_mesh",
    "replicated_sharding",
    "global_cross_clr",
    "global_cross_clr_intra",
    "local_rows_cross_clr_intra",
    "pruned_rows_global",
    "host_local_batch_size",
    "initialize_multihost",
    "is_multihost",
    "ring_attention",
    "sequence_parallel_attention",
]
