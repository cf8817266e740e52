"""Conditional VAE with one-hot modality conditioning.

Parity: reference ConditionalVAE (src/models/conditional_vae.py:14-203), `concat`
method: a Dense(cond_dim → C·8·8) + reshape condition map, bilinearly resized to
the input resolution and concatenated along channels (:107-127); the encoder's
conv_in widens to 2× input channels (:72-78) — in Flax that widening is automatic
because conv params are shaped by the traced input. The decoder stays
unconditional (:144-145,177-179). `inject` is a stub in
the reference (:80-89) whose scaffolding (a condition MLP, :83-85) maps exactly
onto the temb port the ResnetBlocks already carry — here it is implemented for
real: the embedded condition injects into every encoder ResnetBlock
(capability-plus over the reference). `film` is likewise implemented for real
(the reference declares per-level FiLMLayers but never applies them, :91-99,
:129-132): each encoder level's output is feature-wise modulated
(scale·h + shift) from the condition, with the FiLMLayer math of the
reference's :191-203.

Reference quirk kept: a `num_modalities` kwarg from the configs is accepted and
ignored (swallowed by **kwargs in the reference, SURVEY §2.1).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from medvae_tpu.models.base_vae import BaseVAE

DEFAULT_MODALITIES = (
    "chest_xray",
    "pathology",
    "oct",
    "pneumonia",
    "dermatoscope",
    "blood_cell",
    "tissue",
    "retina",
    "breast_ultrasound",
    "abdominal_ct_a",
    "abdominal_ct_c",
    "abdominal_ct_s",
)


class FiLMLayer(nn.Module):
    """Feature-wise Linear Modulation (reference FiLMLayer :191-203)."""

    condition_dim: int
    feature_dim: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale_transform = nn.Dense(
            self.feature_dim, dtype=self.dtype, name="scale_transform"
        )
        self.shift_transform = nn.Dense(
            self.feature_dim, dtype=self.dtype, name="shift_transform"
        )

    def modulation(self, condition: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Per-channel (scale, shift), shape (B, feature_dim) each — computed
        once from the condition so the encoder can apply them without owning
        any conditioning parameters."""
        return self.scale_transform(condition), self.shift_transform(condition)

    def __call__(self, features: jax.Array, condition: jax.Array) -> jax.Array:
        scale, shift = self.modulation(condition)
        return features * scale[:, None, None, :] + shift[:, None, None, :]


class ConditionalVAE(BaseVAE):
    modalities: Optional[Sequence[str]] = None
    condition_dim: Optional[int] = None
    condition_method: str = "concat"  # "concat", "inject", "film"
    num_modalities: Optional[int] = None  # accepted-and-ignored (reference quirk)

    @property
    def modality_list(self) -> Tuple[str, ...]:
        return tuple(self.modalities) if self.modalities else DEFAULT_MODALITIES

    @property
    def cond_dim(self) -> int:
        return self.condition_dim or len(self.modality_list)

    def setup(self):
        super().setup()
        if self.condition_method == "concat":
            # Dense(cond → C·8·8) + ReLU + reshape to an 8×8 condition image
            self.condition_proj = nn.Dense(
                self.input_channels * 8 * 8, dtype=self.dtype, name="condition_proj"
            )
        elif self.condition_method == "film":
            # one FiLM per resolution level, sized to that level's output
            # channels (ch·ch_mult[i] — the level dims the reference's stub
            # allocated but never applied, :91-99)
            self.film_layers = [
                FiLMLayer(
                    condition_dim=self.cond_dim,
                    feature_dim=self.hidden_channels * self.ch_mult[i],
                    dtype=self.dtype,
                    name=f"film_{i}",
                )
                for i in range(len(self.ch_mult))
            ]
        elif self.condition_method == "inject":
            # reference scaffolding (:83-85); applied via the blocks' temb port
            self.condition_embedding = nn.Sequential(
                [nn.Dense(512, dtype=self.dtype), nn.relu, nn.Dense(512, dtype=self.dtype)]
            )

    def create_condition_map(
        self, condition: jax.Array, height: int, width: int
    ) -> jax.Array:
        """Spatial condition map: Dense→ReLU→(8,8,C)→bilinear resize (ref :107-119)."""
        b = condition.shape[0]
        cmap = nn.relu(self.condition_proj(condition.astype(self.dtype)))
        cmap = cmap.reshape(b, self.input_channels, 8, 8)  # torch Unflatten order
        cmap = jnp.transpose(cmap, (0, 2, 3, 1))  # NHWC
        # jax.image.resize 'linear' == torch bilinear align_corners=False
        return jax.image.resize(
            cmap, (b, height, width, self.input_channels), method="linear"
        )

    def encode(
        self,
        x: jax.Array,
        condition: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        if condition is None:
            return super().encode(x, deterministic=deterministic)
        if self.condition_method == "concat":
            cmap = self.create_condition_map(condition, x.shape[1], x.shape[2])
            x_cond = jnp.concatenate([x, cmap.astype(x.dtype)], axis=-1)
            return super().encode(x_cond, deterministic=deterministic)
        if self.condition_method == "inject":
            temb = self.condition_embedding(condition.astype(self.dtype))
            return super().encode(x, deterministic=deterministic, temb=temb)
        if self.condition_method == "film":
            # implemented for real (capability-plus over the reference stub,
            # :129-132): each level's features are scaled/shifted per-channel
            # by the condition, applied after that level's res/attn blocks
            mods = tuple(
                layer.modulation(condition.astype(self.dtype))
                for layer in self.film_layers
            )
            return super().encode(x, deterministic=deterministic, film=mods)
        return super().encode(x, deterministic=deterministic)

    def __call__(
        self,
        x: jax.Array,
        condition: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        return_latents: bool = False,
        noise: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        mean, logvar = self.encode(x, condition, deterministic=deterministic)
        z = self.reparameterize(mean, logvar, noise=noise)
        reconstruction = self.decode(z, deterministic=deterministic)
        outputs = {
            "reconstruction": reconstruction,
            "mean": mean,
            "logvar": logvar,
            "z": z,
        }
        if condition is not None:
            outputs["condition"] = condition
        if return_latents:
            outputs["latents"] = z
        return outputs

    def conditional_sample(
        self, num_samples: int, condition: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """Prior sample + (unconditional) decode — reference :166-179."""
        del condition  # decoder is unconditional, matching the reference TODO
        r = self.encoder_out_res
        z = jax.random.normal(rng, (num_samples, r, r, self.latent_dim), self.dtype)
        return self.decode(z)

    def get_modality_condition(self, modality: str) -> np.ndarray:
        """Host-side one-hot builder (reference :181-188)."""
        mods = self.modality_list
        if modality not in mods:
            raise ValueError(f"Unknown modality: {modality}")
        onehot = np.zeros(len(mods), dtype=np.float32)
        onehot[mods.index(modality)] = 1.0
        return onehot
