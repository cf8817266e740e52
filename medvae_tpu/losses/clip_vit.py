"""CLIP ViT-B/32 image tower in Flax.

The reference's BiomedCLIPLoss tries open_clip's pretrained ViT-B-32 and falls
back to a small CNN if unavailable (src/losses/vae_losses.py:107-113). This is
the ViT side: the standard CLIP vision transformer (32×32 patch conv → class
token + learned positional embedding → pre-LN encoder ×12, width 768, heads 12
→ final LN on the class token → projection to 512), TPU-shaped: all attention
as batched einsums on the MXU, static 7×7+1 token grid at 224².

Pretrained weights are not shippable in this environment (zero egress);
`load_npz` grafts exported weights (flat path → array npz) when provided, and
`BiomedCLIPLoss(encoder="vit")` uses this tower in place of the CNN fallback.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class MHSA(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, hd), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # (b, n, h, hd)
        logits = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (hd**-0.5)
        p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(b, n, d)
        return nn.Dense(d, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln1")(x)
        x = x + MHSA(self.width, self.heads, self.dtype, name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln2")(x)
        h = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.width, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPViT(nn.Module):
    """ViT-B/32 image encoder: (B, 224, 224, 3) → (B, embed_dim)."""

    patch: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b = x.shape[0]
        h = nn.Conv(
            self.width,
            (self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        h = h.reshape(b, -1, self.width)  # (b, 49, width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,),
            jnp.float32,
        )
        h = jnp.concatenate(
            [jnp.tile(cls[None, None, :], (b, 1, 1)).astype(h.dtype), h], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (h.shape[1], self.width),
            jnp.float32,
        )
        h = h + pos.astype(h.dtype)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(h)
        for i in range(self.layers):
            h = Block(self.width, self.heads, self.dtype, name=f"block_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(h[:, 0])
        proj = self.param(
            "proj",
            nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
            jnp.float32,
        )
        return h @ proj.astype(h.dtype)


def load_npz(params: Dict, path: str) -> Dict:
    """Graft exported weights (shared semantics: losses/graft.py)."""
    from medvae_tpu.losses.graft import graft_npz

    return graft_npz(params, path, "CLIP")
