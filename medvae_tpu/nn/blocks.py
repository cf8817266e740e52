"""NN building blocks, TPU-first.

Semantics match the reference blocks (reference: src/models/encoder_decoder.py —
ResnetBlock :110, AttnBlock :68, LinearAttention :36, Downsample/Upsample :173/:194,
Normalize :28, swish :13) but the implementation is JAX/Flax idiomatic:

  * NHWC layout everywhere (TPU conv native layout; torch is NCHW).
  * GroupNorm(min(32, C), eps=1e-6) with a fused GroupNorm+SiLU path — on TPU the
    win is avoiding extra HBM round-trips, delegated to medvae_tpu.ops when enabled.
  * Attention over the h·w token grid as one batched einsum pair → MXU; optional
    Pallas fused-attention kernel for the hot sizes.
  * All shapes static; no data-dependent Python control flow.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


def swish(x: jax.Array) -> jax.Array:
    """x * sigmoid(x) (reference `nonlinearity`, encoder_decoder.py:13)."""
    return jax.nn.silu(x)


def group_norm(num_channels: int, *, name: Optional[str] = None) -> nn.GroupNorm:
    """GroupNorm(min(32, C), eps=1e-6, affine) — reference Normalize (:28).

    Statistics compute in fp32 (flax upcasts); callers should cast the result
    back to the activation dtype (see `norm_act`) so the tensor between norm
    and the next conv stays bf16 — halving HBM traffic on the widest tensors.
    """
    return nn.GroupNorm(
        num_groups=min(32, num_channels),
        epsilon=1e-6,
        use_bias=True,
        use_scale=True,
        name=name,
        dtype=jnp.float32,  # normalization statistics in fp32 for stability
    )


def norm_swish(
    x: jax.Array, num_channels: int, name: str, use_pallas: bool = False
) -> jax.Array:
    """GroupNorm (fp32 stats) → cast back to activation dtype → SiLU.

    With `use_pallas` AND MEDVAE_FUSED_GN=1 the whole norm+affine+swish runs
    as one fused Pallas kernel (fwd + custom-VJP bwd, ops/groupnorm_swish.py).
    Default is XLA's own fusion, which measured FASTER for every shape this
    model family produces (see ops/groupnorm_swish.py). Param structure
    ({scale, bias} under `name`) is identical either way, so checkpoints are
    interchangeable."""
    import os

    if use_pallas and os.environ.get("MEDVAE_FUSED_GN") == "1":
        return GroupNormSwish(num_channels, name=name)(x)
    return swish(group_norm(num_channels, name=name)(x).astype(x.dtype))


class GroupNormSwish(nn.Module):
    """Fused GroupNorm+SiLU with the same param layout as nn.GroupNorm."""

    num_channels: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from medvae_tpu.ops.groupnorm_swish import fused_group_norm_swish_or_none

        scale = self.param(
            "scale", nn.initializers.ones, (self.num_channels,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.num_channels,), jnp.float32
        )
        groups = min(32, self.num_channels)
        out = fused_group_norm_swish_or_none(
            x, scale, bias, num_groups=groups, eps=1e-6
        )
        if out is not None:
            return out
        # jnp fallback sharing the same params
        return swish(_group_norm_ref(x, scale, bias, groups)).astype(x.dtype)


def _group_norm_ref(
    x: jax.Array, scale: jax.Array, bias: jax.Array, groups: int, eps: float = 1e-6
) -> jax.Array:
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = xg.var(axis=(1, 3), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(b, h, w, c)
    return (xn * scale + bias).astype(x.dtype)


class ResnetBlock(nn.Module):
    """GN→swish→3×3 conv ×2 with 1×1 (or 3×3) shortcut on channel change.

    Parity: reference ResnetBlock (encoder_decoder.py:110-170). temb is kept for
    API parity but the reference always builds with temb_ch=0 (:237,:357).
    """

    in_channels: int
    out_channels: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        out_ch = self.out_channels or self.in_channels

        # conv outputs carry a checkpoint name so the selective remat mode
        # (remat="conv", encoder_decoder._resblock_cls) can SAVE them and
        # recompute only the cheap GN/SiLU ops in the backward pass — the
        # FLOPs live in the 3×3 convs, the activation memory is the same
        # either way per saved tensor.
        h = norm_swish(x, self.in_channels, "norm1", self.use_pallas)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = checkpoint_name(h, "resblock_conv")

        if temb is not None:
            h = h + nn.Dense(out_ch, dtype=self.dtype, name="temb_proj")(swish(temb))[
                :, None, None, :
            ]

        h = norm_swish(h, out_ch, "norm2", self.use_pallas)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        h = checkpoint_name(h, "resblock_conv")

        if self.in_channels != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(
                    out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_shortcut"
                )(x)
            else:
                x = nn.Conv(
                    out_ch, (1, 1), padding=0, dtype=self.dtype, name="nin_shortcut"
                )(x)
            x = checkpoint_name(x, "resblock_conv")
        return x + h


class AttnBlock(nn.Module):
    """Vanilla self-attention over the h·w token grid with residual add.

    Parity: reference AttnBlock (encoder_decoder.py:68-107): GN → 1×1 q/k/v →
    softmax((q·kᵀ)·c^-½) → ·v → 1×1 proj_out → +x. Here the bmm pair is one
    batched einsum each (MXU-friendly); an optional Pallas fused path handles
    the whole softmax-attention in VMEM.
    """

    in_channels: int
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h_ = group_norm(self.in_channels, name="norm")(x).astype(x.dtype)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h_)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h_)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h_)

        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)

        if self.use_pallas:
            from medvae_tpu.ops.attention import fused_attention_or_none

            out = fused_attention_or_none(q, k, v)
        else:
            out = None
        if out is None:
            from medvae_tpu.ops.attention import reference_attention

            out = reference_attention(q, k, v)

        out = out.reshape(b, hh, ww, c).astype(x.dtype)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class LinearAttention(nn.Module):
    """O(n) linear attention (reference LinearAttention, encoder_decoder.py:36-58):
    softmax over the key axis, context = k·vᵀ, out = context·q."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        hidden = self.dim_head * self.heads
        qkv = nn.Conv(
            hidden * 3, (1, 1), use_bias=False, dtype=self.dtype, name="to_qkv"
        )(x)
        qkv = qkv.reshape(b, hh * ww, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        # context[b,h,d,e] = sum_n k[b,n,h,d] v[b,n,h,e]
        context = jnp.einsum(
            "bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = jnp.einsum(
            "bhde,bnhd->bnhe", context, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(b, hh, ww, hidden)
        return nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_out")(out)


class LinAttnBlock(nn.Module):
    """Single-head linear attention with dim_head = C (reference :61-65)."""

    in_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return LinearAttention(
            dim=self.in_channels,
            heads=1,
            dim_head=self.in_channels,
            dtype=self.dtype,
            name="attn",
        )(x)


def make_attn(
    in_channels: int,
    attn_type: str = "vanilla",
    dtype: jnp.dtype = jnp.float32,
    use_pallas: bool = False,
    name: Optional[str] = None,
):
    if attn_type == "vanilla":
        return AttnBlock(
            in_channels, dtype=dtype, use_pallas=use_pallas, name=name
        )
    if attn_type == "linear":
        return LinAttnBlock(in_channels, dtype=dtype, name=name)
    raise NotImplementedError(f"Attention type {attn_type} not implemented")


class Downsample(nn.Module):
    """Stride-2 3×3 conv with the reference's asymmetric (0,1,0,1) pad
    (encoder_decoder.py:186-188), or 2×2 avg-pool when with_conv=False."""

    in_channels: int
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.with_conv:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return nn.Conv(
                self.in_channels,
                (3, 3),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """Nearest ×2 upsample then 3×3 conv (reference :194-209)."""

    in_channels: int
    with_conv: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        # nearest-neighbour ×2: repeat along spatial dims (static shapes)
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(
                self.in_channels, (3, 3), padding=1, dtype=self.dtype, name="conv"
            )(x)
        return x
