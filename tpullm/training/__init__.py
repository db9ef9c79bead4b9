from .train import OptimConfig, loss_fn, make_optimizer, make_train_step, train_epoch

__all__ = ["OptimConfig", "loss_fn", "make_optimizer", "make_train_step", "train_epoch"]
