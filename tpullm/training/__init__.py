from .data import Dataset
from .train import (
    OptimConfig,
    evaluate,
    fit,
    loss_fn,
    make_eval_step,
    make_optimizer,
    make_train_step,
    train_epoch,
)

__all__ = ["Dataset", "OptimConfig", "evaluate", "fit", "loss_fn",
           "make_eval_step", "make_optimizer", "make_train_step",
           "train_epoch"]
