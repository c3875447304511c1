"""Training runtime: grid statics, jitted SPMD train/eval steps, engine."""

from .statics import GridStatics, build_grid_statics
from .step import (
    TrainState,
    create_train_state,
    make_train_step,
    make_eval_step,
    forward_losses,
)
from .engine import Engine
from .checkpoint import save_checkpoint, restore_checkpoint, latest_step

__all__ = [
    "GridStatics",
    "build_grid_statics",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "forward_losses",
    "Engine",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]
