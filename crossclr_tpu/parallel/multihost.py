"""Multi-host initialization and cross-host utilities.

The reference has no distributed story at all (SURVEY.md §2.5).  On a TPU
pod slice each host sees only its local chips until
``jax.distributed.initialize`` runs; this wrapper makes that a one-liner
that is safe to call in single-host settings too (BASELINE.json config 5:
multi-host v5e-16).
"""

from __future__ import annotations

import os

import jax

__all__ = ["initialize_multihost", "is_multihost", "host_local_batch_size"]

_initialized = False


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX's distributed runtime when running multi-host.

    No-ops (returns False) when the environment is single-host and no
    coordinator is configured.  On TPU pods the arguments are discovered
    from the TPU metadata automatically; on CPU/GPU fleets pass them (or
    set JAX_COORDINATOR_ADDRESS etc.).  Idempotent.
    """
    global _initialized
    if _initialized:
        return True
    configured = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0
    )
    if not configured:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def host_local_batch_size(global_batch_size: int) -> int:
    """Per-host batch size for a globally-specified batch.

    Data loading is per-host: each host feeds its local shard of the
    global batch; deterministic sharding by (step, process_index) keeps
    restart-from-checkpoint exact (SURVEY.md §5 failure recovery).
    """
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by {n} hosts"
        )
    return global_batch_size // n
