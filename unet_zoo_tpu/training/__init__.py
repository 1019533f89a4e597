"""Training harness: jitted train step, multi-sample validation, plateau
LR schedule, full-state orbax checkpoints, CLI."""

from unet_zoo_tpu.training.schedule import PlateauState, plateau_init, plateau_update
from unet_zoo_tpu.training.state import (
    TrainState,
    restore_checkpoint,
    save_checkpoint,
)
from unet_zoo_tpu.training.trainer import Trainer

__all__ = [
    "PlateauState",
    "plateau_init",
    "plateau_update",
    "TrainState",
    "save_checkpoint",
    "restore_checkpoint",
    "Trainer",
]
