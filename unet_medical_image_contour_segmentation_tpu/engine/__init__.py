from .checkpoint import load_checkpoint, load_weights, save_checkpoint
from .evaluate import evaluate, make_eval_step
from .optim import RMSpropConfig, clip_by_global_norm, init_rmsprop, rmsprop_update, warm_restarts_lr
from .train import TrainState, init_train_state, make_train_step, train_model

__all__ = [
    "load_checkpoint",
    "load_weights",
    "save_checkpoint",
    "evaluate",
    "make_eval_step",
    "RMSpropConfig",
    "clip_by_global_norm",
    "init_rmsprop",
    "rmsprop_update",
    "warm_restarts_lr",
    "TrainState",
    "init_train_state",
    "make_train_step",
    "train_model",
]
