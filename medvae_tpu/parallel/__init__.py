from medvae_tpu.parallel.shard_map_step import (
    build_shard_map_gan_step,
    build_shard_map_train_step,
)
from medvae_tpu.parallel.tensor_parallel import (
    shard_params,
    shard_state,
    state_shardings,
)

__all__ = [
    "build_shard_map_gan_step",
    "build_shard_map_train_step",
    "shard_params",
    "shard_state",
    "state_shardings",
]
