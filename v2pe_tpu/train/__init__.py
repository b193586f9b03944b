from v2pe_tpu.train.optimizer import TrainConfig, build_optimizer
from v2pe_tpu.train.train_step import make_train_step

__all__ = ["TrainConfig", "build_optimizer", "make_train_step"]
