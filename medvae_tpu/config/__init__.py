from medvae_tpu.config.compose import ConfigDict, compose, load_yaml, merge
from medvae_tpu.config.instantiate import instantiate, register_target

__all__ = [
    "ConfigDict",
    "compose",
    "load_yaml",
    "merge",
    "instantiate",
    "register_target",
]
