from medvae_tpu.core.mesh import (
    MeshSpec,
    create_mesh,
    data_sharding,
    replicated_sharding,
)
from medvae_tpu.core.precision import Policy, default_policy
from medvae_tpu.core.rng import RngStream, set_seed

__all__ = [
    "MeshSpec",
    "create_mesh",
    "data_sharding",
    "replicated_sharding",
    "Policy",
    "default_policy",
    "RngStream",
    "set_seed",
]
