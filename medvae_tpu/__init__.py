"""medvae_tpu — a TPU-native (JAX / XLA / Pallas) framework for conditional and
disentangled VAEs on the MedMNIST 2-D medical-imaging datasets.

Capability parity target: parsakzr/medvae-disentangled-multimodal (PyTorch Lightning).
Everything here is designed TPU-first: NHWC layouts, static shapes, bf16 compute on
the MXU, shard_map data parallelism over a `jax.sharding.Mesh`, Pallas kernels for
the hot fused ops, and a host pipeline that ships uint8 and normalizes on device.
"""

__version__ = "0.1.0"

from medvae_tpu import config  # noqa: F401
