"""Device-mesh construction helpers.

The reference has no distributed code at all (SURVEY.md §2.5 — its only
device handling is unconditional ``.cuda()``).  The TPU-native scaling
story is a ``jax.sharding.Mesh``: data parallelism over the ``data`` axis
(batch sharding + all-gathered global negatives over ICI) and optional
tensor parallelism of the encoder matmuls over the ``model`` axis.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated_sharding", "P"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``n_data=None`` uses all devices not consumed by the model axis.
    On a single chip this degenerates to a 1×1 mesh, so every code path
    (sharded train step, global-negative loss) runs unchanged from 1 chip
    to a pod slice.
    """
    if devices is None:
        devices = jax.devices()
    n_dev = len(devices)
    if n_dev % n_model != 0:
        raise ValueError(f"{n_dev} devices not divisible by model axis {n_model}")
    if n_data is None:
        n_data = n_dev // n_model
    if n_data * n_model != n_dev:
        devices = devices[: n_data * n_model]
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
