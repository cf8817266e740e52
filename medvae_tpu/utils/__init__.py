from medvae_tpu.utils.training_utils import (
    EarlyStopping,
    count_parameters,
    ema_update,
    gradient_penalty,
)
from medvae_tpu.utils.logging import MetricLogger

__all__ = [
    "EarlyStopping",
    "count_parameters",
    "ema_update",
    "gradient_penalty",
    "MetricLogger",
]
