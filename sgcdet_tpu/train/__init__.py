from .optim import make_optimizer, onecycle_schedule, param_label
from .loop import TrainState, make_train_step, init_train_state

__all__ = [
    "make_optimizer",
    "onecycle_schedule",
    "param_label",
    "TrainState",
    "make_train_step",
    "init_train_state",
]
