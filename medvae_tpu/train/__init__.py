from medvae_tpu.train.optim import build_optimizer, build_schedule
from medvae_tpu.train.state import TrainState, create_train_state
from medvae_tpu.train.step import build_eval_step, build_train_step
from medvae_tpu.train.trainer import Trainer

__all__ = [
    "build_optimizer",
    "build_schedule",
    "TrainState",
    "create_train_state",
    "build_train_step",
    "build_eval_step",
    "Trainer",
]
