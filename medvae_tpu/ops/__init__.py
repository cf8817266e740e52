"""Pallas TPU kernels for the hot fused ops (attention, GroupNorm+SiLU, loss).

Each op exposes a `*_or_none` entry point: it returns None when the shape/dtype
is outside the kernel's envelope (or when running on a non-TPU backend), and the
caller falls back to the jnp implementation — keeping CPU tests green while the
TPU path takes the fused kernel.
"""

from medvae_tpu.ops.attention import fused_attention_or_none
from medvae_tpu.ops.groupnorm_swish import fused_group_norm_swish_or_none

__all__ = ["fused_attention_or_none", "fused_group_norm_swish_or_none"]
