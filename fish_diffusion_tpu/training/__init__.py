from .optim import build_lr_schedule, build_optimizer
from .state import TrainState, create_train_state, make_train_step

__all__ = [
    "build_lr_schedule",
    "build_optimizer",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
