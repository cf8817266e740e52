"""Base VAE.

Parity: reference BaseVAE (src/models/base_vae.py:14-153) — encoder emitting
2·latent_dim channel maps split into (mean, logvar), reparameterization
mean + eps·exp(½ logvar), spatial latent of shape (B, enc_res, enc_res, latent),
prior N(0,1). Distribution objects are replaced by analytic KL in the losses
(losses/elbo.py) — same math, one fused graph instead of torch.distributions.

TPU-first: NHWC, static shapes, explicit RNG via flax's 'sample' stream.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medvae_tpu.nn.encoder_decoder import Decoder, Encoder


def _codec_classes(remat):
    """Encoder/Decoder classes with the requested remat granularity: "full"
    wraps the whole module (saves only its input for the backward pass)."""
    if remat == "full":
        # __call__(self=0, x/z=1, deterministic=2)
        return (
            nn.remat(Encoder, static_argnums=(2,)),
            nn.remat(Decoder, static_argnums=(2,)),
        )
    return Encoder, Decoder


class BaseVAE(nn.Module):
    input_channels: int = 1
    latent_dim: int = 128
    hidden_channels: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resolution: int = 224
    use_linear_attn: bool = False
    attn_type: str = "vanilla"
    double_z: bool = True
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    # activation checkpointing: False | True/"block" (per-resblock) | "full"
    # (whole encoder/decoder — needed at 224² with batch ≥64, where even
    # block-boundary activations exceed HBM)
    remat: object = False

    @property
    def encoder_out_res(self) -> int:
        return self.resolution // (2 ** (len(self.ch_mult) - 1))

    def setup(self):
        enc_cls, dec_cls = _codec_classes(self.remat)
        self.encoder = enc_cls(
            ch=self.hidden_channels,
            out_ch=self.input_channels,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout,
            resamp_with_conv=True,
            in_channels=self.input_channels,
            resolution=self.resolution,
            z_channels=self.latent_dim,
            double_z=self.double_z,
            use_linear_attn=self.use_linear_attn,
            attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
        )
        self.decoder = dec_cls(
            ch=self.hidden_channels,
            out_ch=self.input_channels,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout,
            resamp_with_conv=True,
            in_channels=self.input_channels,
            resolution=self.resolution,
            z_channels=self.latent_dim,
            use_linear_attn=self.use_linear_attn,
            attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
        )

    # --- API parity with the reference ------------------------------------

    def encode(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        temb: Optional[jax.Array] = None,
        film: Optional[Sequence[Tuple[jax.Array, jax.Array]]] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        h = self.encoder(x, deterministic, temb, film)
        mean, logvar = jnp.split(h, 2, axis=-1)
        return mean, logvar

    def decode(self, z: jax.Array, *, deterministic: bool = True) -> jax.Array:
        return self.decoder(z, deterministic)

    def reparameterize(
        self,
        mean: jax.Array,
        logvar: jax.Array,
        rng: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """`noise`, when given, replaces the rng draw with caller-provided
        eps — the hook that makes single-chip jit, explicit shard_map, and
        microbatched grad-accumulation steps *bitwise comparable* (per-sample
        noise rides the batch, sharded with it; tests/test_step_equivalence.py)."""
        std = jnp.exp(0.5 * logvar)
        if noise is None:
            if rng is None:
                rng = self.make_rng("sample")
            noise = jax.random.normal(rng, std.shape, dtype=std.dtype)
        return mean + noise.astype(std.dtype) * std

    def __call__(
        self,
        x: jax.Array,
        *,
        deterministic: bool = True,
        return_latents: bool = False,
        noise: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        mean, logvar = self.encode(x, deterministic=deterministic)
        z = self.reparameterize(mean, logvar, noise=noise)
        reconstruction = self.decode(z, deterministic=deterministic)
        outputs = {
            "reconstruction": reconstruction,
            "mean": mean,
            "logvar": logvar,
            "z": z,
        }
        if return_latents:
            outputs["latents"] = z
        return outputs

    def sample(self, num_samples: int, rng: jax.Array) -> jax.Array:
        """Draw a spatial latent from the prior and decode (reference :120-129)."""
        r = self.encoder_out_res
        z = jax.random.normal(rng, (num_samples, r, r, self.latent_dim), self.dtype)
        return self.decode(z)
