from .optim import make_lr_schedule, make_optimizer
from .ema import EmaState, ema_init, ema_update
from .step import TrainState, create_train_state, make_eval_step, make_train_step, total_loss

__all__ = [
    "make_lr_schedule", "make_optimizer",
    "EmaState", "ema_init", "ema_update",
    "TrainState", "create_train_state", "make_eval_step", "make_train_step",
    "total_loss",
]
