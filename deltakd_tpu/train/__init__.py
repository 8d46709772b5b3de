from deltakd_tpu.train.loop import run, train_one_epoch, validate
from deltakd_tpu.train.optim import cosine_epoch_schedule, make_optimizer
from deltakd_tpu.train.state import TrainState
from deltakd_tpu.train.step import build_eval_step, build_train_step

__all__ = ["run", "train_one_epoch", "validate", "cosine_epoch_schedule",
           "make_optimizer", "TrainState", "build_eval_step", "build_train_step"]
