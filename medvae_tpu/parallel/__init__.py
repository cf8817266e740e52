from medvae_tpu.parallel.shard_map_step import build_shard_map_train_step

__all__ = ["build_shard_map_train_step"]
