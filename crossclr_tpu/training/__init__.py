"""Training: jitted step, optimizer, checkpointing."""

from .trainer import TrainConfig, Trainer, TrainState, make_loss_fn, make_optimizer
from .checkpoint import CheckpointManager

__all__ = [
    "TrainConfig",
    "Trainer",
    "TrainState",
    "make_loss_fn",
    "make_optimizer",
    "CheckpointManager",
]
