"""Training: losses, torch-exact SGD w/ param groups, jitted train/eval steps,
LR schedules, and the three driver loops mirroring the reference scripts."""

from .losses import bce_loss, detection_loss
from .optim import (
    CosineSchedule,
    MultiStepSchedule,
    SGDState,
    build_schedule,
    sgd_init,
    sgd_update,
)
from .state import TrainState
from .steps import make_train_step, make_eval_step

__all__ = [
    "bce_loss",
    "detection_loss",
    "SGDState",
    "sgd_init",
    "sgd_update",
    "MultiStepSchedule",
    "CosineSchedule",
    "build_schedule",
    "TrainState",
    "make_train_step",
    "make_eval_step",
]
