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


def _count_granules(devices, attr: str) -> int:
    """Distinct DCN granules (TPU slices / processes) among ``devices``.

    Off multi-slice hardware (CPU, single slice) the attribute is absent
    or constant and this returns 1 — the hybrid layout degenerates away.
    """
    ids = set()
    for d in devices:
        try:
            ids.add(getattr(d, attr))
        except AttributeError:
            return 1
    return len(ids)


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    *,
    devices: list | None = None,
    dcn: int | str | None = "auto",
    granule: str = "slice",
) -> Mesh:
    """Build a ``(data, model)`` mesh over the available devices.

    ``n_data=None`` uses all devices not consumed by the model axis.
    On a single chip this degenerates to a 1×1 mesh, so every code path
    (sharded train step, global-negative loss) runs unchanged from 1 chip
    to a pod slice.

    Multi-slice pods (slices joined by DCN, not ICI): ``dcn="auto"``
    detects the slice count from ``device.slice_index`` and lays the
    devices out HIERARCHICALLY — the ``model`` axis (TP matmul
    collectives, ring-attention ppermute: per-layer, latency-bound)
    never leaves a slice's ICI; the ``data`` axis is slice-major, so
    only its outer segments — the once-per-step gradient psum and the
    global-negative all-gather — cross DCN.  The mesh still has the same
    two axes, so every PartitionSpec in the trainer/loss is unchanged.
    ``dcn=<int>`` forces a granule count; ``granule="process"`` uses
    process boundaries instead of slice indices (CPU testing, or
    platforms that don't set ``slice_index``); ``granule="contiguous"``
    splits the device list into ``dcn`` equal contiguous granules with
    the SAME layout contract (model axis inside a granule, data axis
    granule-major) — the single-process testing knob for forced-DCN
    layouts, where every device shares one process/slice index and the
    attribute-based grouping would (correctly) see only one granule.
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

    if granule not in ("slice", "process", "contiguous"):
        raise ValueError(
            "granule must be 'slice', 'process', or 'contiguous', "
            f"got {granule!r}"
        )
    if granule == "contiguous":
        if dcn in ("auto", None):
            raise ValueError("granule='contiguous' needs an explicit dcn=<int>")
        n_granules = int(dcn)
        if n_granules > 1:
            if n_data % n_granules or n_data * n_model != len(devices):
                raise ValueError(
                    f"data axis {n_data} not divisible by {n_granules} DCN "
                    "granules (or devices don't fill the mesh)"
                )
            per = len(devices) // n_granules
            grid = np.concatenate(
                [
                    np.asarray(devices[g * per : (g + 1) * per]).reshape(
                        n_data // n_granules, n_model
                    )
                    for g in range(n_granules)
                ],
                axis=0,
            )
            return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
        grid = np.asarray(devices).reshape(n_data, n_model)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    attr = "slice_index" if granule == "slice" else "process_index"
    n_granules = (
        _count_granules(devices, attr) if dcn == "auto" else int(dcn or 1)
    )
    if n_granules > 1:
        from jax.experimental import mesh_utils

        if n_data % n_granules:
            raise ValueError(
                f"data axis {n_data} not divisible by {n_granules} DCN "
                f"granules — global batch must split evenly across "
                f"{attr} groups"
            )
        if n_data * n_model != len(devices):
            raise ValueError(
                "hybrid layout needs n_data * n_model == len(devices); "
                f"got {n_data}x{n_model} over {len(devices)}"
            )
        grid = mesh_utils.create_hybrid_device_mesh(
            (n_data // n_granules, n_model),
            (n_granules, 1),
            devices=devices,
            process_is_granule=(granule == "process"),
        )
    else:
        grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
