"""VAE Encoder / Decoder (MedVAE-style ResNet + attention conv stacks).

Structural parity with the reference (src/models/encoder_decoder.py:212-451):
  Encoder: conv_in → per-level [num_res_blocks × (ResnetBlock [+Attn])] →
           Downsample ×(levels−1) → mid(Res, Attn, Res) → GN+swish+conv_out
           emitting 2·z_channels maps when double_z.
  Decoder: conv_in(z) → mid(Res, Attn, Res) → per-level
           [(num_res_blocks+1) × (ResnetBlock [+Attn])] → Upsample ×(levels−1) →
           GN+swish+conv_out (optional tanh).

TPU-first differences: NHWC, static shapes, bf16-capable conv dtype, attention
insertion resolved at construction time (no Python branching under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medvae_tpu.nn.blocks import Downsample, ResnetBlock, Upsample, make_attn, norm_swish


def _resblock_cls(remat):
    """Rematerialized ResnetBlock at the requested granularity.

    False       — no remat (all activations saved).
    "conv"      — selective: per-block remat with a save_only_these_names
                  policy on the blocks' conv outputs, so the backward pass
                  recomputes only the GN/SiLU ops and never re-runs a 3×3
                  conv. **Measured useless on v5e** (ops/PERF_224.md,
                  scripts/probe_remat_memory.py): compiled peak HBM is
                  within 9 MiB of no-remat at 224² bs 32 — XLA's vanilla
                  backward already recomputes fused elementwise epilogues,
                  so naming the conv outputs saves nothing — and the remat
                  region structure costs enough scheduler freedom that
                  bs 48 *fails to compile* where no-remat fits. Kept as a
                  correct, tested policy point; do not reach for it.
    other truthy ("block", "full", True) — per-resblock full remat: only the
                  block input is saved; both convs recompute in backward.
                  Measured peak HBM at 224²: 11.3 GiB vs 14.7 no-remat
                  (bs 32), 14.4 vs 15.2 (bs 48); cost ~12% step time.
                  This is the mode the trainer auto-enables at ≥112².
    """
    if not remat:
        return ResnetBlock
    if remat not in (True, "block", "conv", "full"):
        raise ValueError(
            f"remat={remat!r}: expected False, True/'block', 'conv', or 'full'"
        )
    # __call__(self=0, x=1, temb=2, deterministic=3)
    if remat == "conv":
        return nn.remat(
            ResnetBlock,
            static_argnums=(3,),
            policy=jax.checkpoint_policies.save_only_these_names(
                "resblock_conv"
            ),
        )
    return nn.remat(ResnetBlock, static_argnums=(3,))


class Encoder(nn.Module):
    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    double_z: bool = True
    use_linear_attn: bool = False
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # False | True/"block" (per-resblock) — "full" granularity is applied one
    # level up (models/base_vae.py wraps the whole Encoder/Decoder in nn.remat)
    remat: object = False

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool = True,
        temb: Optional[jax.Array] = None,
        film: Optional[Sequence[Tuple[jax.Array, jax.Array]]] = None,
    ) -> jax.Array:
        """`film`, when given, is one (scale, shift) pair of shape (B, C_level)
        per resolution level; each level's output is feature-wise modulated
        after its res/attn blocks (FiLM conditioning — the conditioning params
        live in the caller, so the encoder stays condition-agnostic)."""
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        block_cls = _resblock_cls(
            "block" if self.remat == "full" else self.remat
        )  # full-codec remat nests plain block remat inside
        num_resolutions = len(self.ch_mult)
        in_ch_mult = (1,) + tuple(self.ch_mult)

        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)

        curr_res = self.resolution
        block_in = self.ch
        for i_level in range(num_resolutions):
            block_in = self.ch * in_ch_mult[i_level]
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = block_cls(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"down_{i_level}_block_{i_block}",
                )(h, temb, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(
                        block_in,
                        attn_type=attn_type,
                        dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        name=f"down_{i_level}_attn_{i_block}",
                    )(h)
            if film is not None:
                scale, shift = film[i_level]
                h = h * scale[:, None, None, :].astype(h.dtype) + shift[
                    :, None, None, :
                ].astype(h.dtype)
            if i_level != num_resolutions - 1:
                h = Downsample(
                    block_in,
                    self.resamp_with_conv,
                    dtype=self.dtype,
                    name=f"down_{i_level}_downsample",
                )(h)
                curr_res //= 2

        # middle
        h = block_cls(
            in_channels=block_in,
            out_channels=block_in,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_block_1",
        )(h, temb, deterministic)
        h = make_attn(
            block_in,
            attn_type=attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_attn_1",
        )(h)
        h = block_cls(
            in_channels=block_in,
            out_channels=block_in,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_block_2",
        )(h, temb, deterministic)

        # end
        h = norm_swish(h, block_in, "norm_out", self.use_pallas)
        out_channels = 2 * self.z_channels if self.double_z else self.z_channels
        h = nn.Conv(
            out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h


class Decoder(nn.Module):
    ch: int
    out_ch: int
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    in_channels: int
    resolution: int
    z_channels: int
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    give_pre_end: bool = False
    tanh_out: bool = False
    use_linear_attn: bool = False
    attn_type: str = "vanilla"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: object = False

    @nn.compact
    def __call__(
        self, z: jax.Array, deterministic: bool = True,
        temb: Optional[jax.Array] = None,
    ) -> jax.Array:
        attn_type = "linear" if self.use_linear_attn else self.attn_type
        block_cls = _resblock_cls(
            "block" if self.remat == "full" else self.remat
        )  # full-codec remat nests plain block remat inside
        num_resolutions = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[num_resolutions - 1]
        curr_res = self.resolution // 2 ** (num_resolutions - 1)

        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)

        # middle
        h = block_cls(
            in_channels=block_in,
            out_channels=block_in,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_block_1",
        )(h, temb, deterministic)
        h = make_attn(
            block_in,
            attn_type=attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_attn_1",
        )(h)
        h = block_cls(
            in_channels=block_in,
            out_channels=block_in,
            dropout=self.dropout,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="mid_block_2",
        )(h, temb, deterministic)

        # upsampling (reference iterates reversed(range(levels)), :434-440)
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = block_cls(
                    in_channels=block_in,
                    out_channels=block_out,
                    dropout=self.dropout,
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    name=f"up_{i_level}_block_{i_block}",
                )(h, temb, deterministic)
                block_in = block_out
                if curr_res in self.attn_resolutions:
                    h = make_attn(
                        block_in,
                        attn_type=attn_type,
                        dtype=self.dtype,
                        use_pallas=self.use_pallas,
                        name=f"up_{i_level}_attn_{i_block}",
                    )(h)
            if i_level != 0:
                h = Upsample(
                    block_in,
                    self.resamp_with_conv,
                    dtype=self.dtype,
                    name=f"up_{i_level}_upsample",
                )(h)
                curr_res *= 2

        if self.give_pre_end:
            return h

        h = norm_swish(h, block_in, "norm_out", self.use_pallas)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        if self.tanh_out:
            h = jnp.tanh(h)
        return h
