"""medvae_tpu — a TPU-native (JAX / XLA / Pallas) framework for conditional and
disentangled VAEs on the MedMNIST 2-D medical-imaging datasets.

Capability parity target: parsakzr/medvae-disentangled-multimodal (PyTorch Lightning).
Everything here is designed TPU-first: NHWC layouts, static shapes, bf16 compute on
the MXU, shard_map data parallelism over a `jax.sharding.Mesh`, Pallas kernels for
the hot fused ops, and a host pipeline that ships uint8 and normalizes on device.
"""

__version__ = "0.1.0"

from medvae_tpu import config  # noqa: F401

# Persistent XLA compilation cache: relaunches (supervisor restarts, repeated
# CLI runs on one checkpoint, test reruns) skip their compile costs entirely.
# MEDVAE_COMPILE_CACHE=0 disables; see core/compile_cache.py.
from medvae_tpu.core.compile_cache import enable_compile_cache as _ecc

_ecc()
del _ecc
