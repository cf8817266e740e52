"""Adversarial (PatchGAN) loss with adaptive generator weighting.

Parity target: LPIPSWithDiscriminator (reference src/losses/vae_losses.py:214-382):
  * generator objective: perceptual_factor·LPIPS + kl_factor·KL(sum/bsz)
    + d_weight·(−mean D(recon)) [+ biomedclip_factor·CLIP-feature], with the
    adversarial term gated on global_step ≥ discriminator_iter_start (:293)
  * adaptive weight d_weight = ‖∇_last p_loss‖ / (‖∇_last g_loss‖ + 1e-4),
    clamped to [0, 1e4] and detached (:370-382) — in JAX this is two jax.grad
    calls w.r.t. the decoder's conv_out kernel, stop_gradient'ed so the outer
    differentiation treats it as a constant
  * discriminator objective: hinge loss ½(E relu(1−D(x)) + E relu(1+D(x̂)))
    on detached reconstructions (:341-368); grayscale repeated to RGB for the
    discriminator (:297-301, :346-352)

The torch `.detach()` boundaries become `lax.stop_gradient`; step gating becomes
`jnp.where` on a traced step (both branches are cheap scalar math — the expensive
D(recon) forward always runs, exactly as in the reference once past the gate;
before the gate the reference skips it, here its contribution is zeroed, keeping
the jitted graph static).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss, _to_rgb


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """½·(E[relu(1−real)] + E[relu(1+fake)]) (reference :359-362)."""
    return 0.5 * (
        jnp.mean(jax.nn.relu(1.0 - logits_real.astype(jnp.float32)))
        + jnp.mean(jax.nn.relu(1.0 + logits_fake.astype(jnp.float32)))
    )


def adaptive_weight(
    nll_grads, g_grads, clip_max: float = 1e4, eps: float = 1e-4
) -> jax.Array:
    """‖∇ nll‖ / (‖∇ g‖ + eps), clamped and detached (reference :370-382)."""

    def norm(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.sqrt(
            sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in leaves)
        )

    w = norm(nll_grads) / (norm(g_grads) + eps)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, clip_max))


@dataclasses.dataclass
class LPIPSWithDiscriminator:
    """Factor bundle + the generator/discriminator loss heads.

    The model-dependent pieces (the discriminator apply fn and the
    ∇-w.r.t.-last-layer closures) are supplied by the train step; this class
    owns the frozen perceptual nets and the weighting logic.
    """

    discriminator_factor: float = 1.0
    perceptual_factor: float = 1.0
    # Taming-style pixel L1 inside the reconstruction term. The reference's
    # generator objective (vae_losses.py:320-325) is perceptual-only — with
    # pretrained LPIPS that IS a strong image distance, but a random trunk
    # (this environment has no egress for the weights) can be gamed: the
    # generator minimizes random-feature distance while pixel error grows.
    # pixel_factor adds pixel_factor·mean|x − x̂| to the generator loss and
    # to the adaptive-weight numerator (taming-transformers'
    # LPIPSWithDiscriminator rec_loss = |x−x̂| + w·LPIPS). 0 = exact
    # reference parity.
    pixel_factor: float = 0.0
    kl_factor: float = 1.0
    discriminator_iter_start: int = 50001
    use_biomedclip_loss: bool = False
    biomedclip_factor: float = 1.0
    clip_encoder: str = "simple"  # "simple" (CNN fallback) or "vit" (ViT-B/32)
    # pretrained-weight grafts (scripts/export_torch_weights.py npz format);
    # None keeps the fixed-seed random trunks
    weights_path: "str | None" = None
    clip_weights_path: "str | None" = None
    # compute dtype for the frozen towers (params stay fp32; reductions fp32).
    # The production step runs them in bf16 — ops/PERF_FLAGSHIP.md.
    tower_dtype: str = "float32"

    def __post_init__(self):
        self.perceptual_loss = LPIPSLoss(
            weights_path=self.weights_path, dtype=self.tower_dtype
        )
        self.biomed_clip_loss = (
            BiomedCLIPLoss(
                compute_rec_loss=True,
                compute_lat_loss=False,
                encoder=self.clip_encoder,
                weights_path=self.clip_weights_path,
                dtype=self.tower_dtype,
            )
            if self.use_biomedclip_loss
            else None
        )

    def init_frozen(self, rng: jax.Array, image_hw: int) -> Dict:
        k1, k2 = jax.random.split(rng)
        frozen = {"lpips": self.perceptual_loss.init(k1, image_hw)}
        if self.biomed_clip_loss is not None:
            frozen["clip"] = self.biomed_clip_loss.init(k2)
        return frozen

    # -- generator ---------------------------------------------------------

    def generator_loss(
        self,
        frozen: Dict,
        inputs: jax.Array,
        reconstructions: jax.Array,
        kl_per_sample_sum: jax.Array,
        logits_fake: jax.Array,
        d_weight: jax.Array,
        global_step: jax.Array,
        split: str = "train",
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        bsz = inputs.shape[0]
        p_loss = self.perceptual_loss(frozen["lpips"], inputs, reconstructions)
        pix_loss = self.pixel_l1(inputs, reconstructions)

        bc_loss = jnp.asarray(0.0, jnp.float32)
        if self.biomed_clip_loss is not None:
            bc_loss = self.biomed_clip_loss(
                frozen["clip"], inputs, rec=reconstructions
            )

        kl_loss = jnp.sum(kl_per_sample_sum.astype(jnp.float32)) / bsz

        d_valid = (global_step >= self.discriminator_iter_start).astype(jnp.float32)
        g_loss = -jnp.mean(logits_fake.astype(jnp.float32))
        eff_weight = d_valid * d_weight * self.discriminator_factor

        loss = (
            self.perceptual_factor * p_loss
            + self.pixel_factor * pix_loss
            + self.kl_factor * kl_loss
            + eff_weight * g_loss
        )
        if self.biomed_clip_loss is not None:
            loss = loss + self.biomedclip_factor * bc_loss

        log = {
            f"{split}/total_loss": jax.lax.stop_gradient(loss),
            f"{split}/kl_loss": jax.lax.stop_gradient(kl_loss),
            f"{split}/p_loss": jax.lax.stop_gradient(p_loss),
            f"{split}/d_weight": eff_weight,
            f"{split}/g_loss": jax.lax.stop_gradient(d_valid * g_loss),
        }
        if self.pixel_factor:
            log[f"{split}/pix_loss"] = jax.lax.stop_gradient(pix_loss)
        if self.biomed_clip_loss is not None:
            log[f"{split}/bc_loss"] = jax.lax.stop_gradient(bc_loss)
        return loss, log

    @staticmethod
    def pixel_l1(inputs: jax.Array, reconstructions: jax.Array) -> jax.Array:
        return jnp.mean(
            jnp.abs(
                inputs.astype(jnp.float32)
                - reconstructions.astype(jnp.float32)
            )
        )

    def rec_for_adaptive(
        self, frozen: Dict, inputs: jax.Array, reconstructions: jax.Array
    ) -> jax.Array:
        """Numerator objective for the adaptive weight: the reference uses the
        raw perceptual loss (:370-373); with pixel_factor > 0 the pixel term
        joins it, as in taming's nll-based adaptive weight."""
        p = self.perceptual_loss(frozen["lpips"], inputs, reconstructions)
        if self.pixel_factor:
            p = p + self.pixel_factor * self.pixel_l1(inputs, reconstructions)
        return p

    # -- discriminator ------------------------------------------------------

    def discriminator_loss(
        self,
        logits_real: jax.Array,
        logits_fake: jax.Array,
        global_step: jax.Array,
        split: str = "train",
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        d_valid = (global_step >= self.discriminator_iter_start).astype(jnp.float32)
        d_loss = d_valid * hinge_d_loss(logits_real, logits_fake)
        # logit means make the competitive state legible: real≫0 and fake≪0
        # (hinge margins met, d_loss→0) means D is winning; both near 0 with
        # d_loss ≈ 1 means balance; fake > 0 means G is fooling D.
        return d_loss, {
            f"{split}/d_loss": jax.lax.stop_gradient(d_loss),
            f"{split}/logits_real": jax.lax.stop_gradient(
                d_valid * jnp.mean(logits_real.astype(jnp.float32))
            ),
            f"{split}/logits_fake": jax.lax.stop_gradient(
                d_valid * jnp.mean(logits_fake.astype(jnp.float32))
            ),
        }


def discriminator_input(x: jax.Array) -> jax.Array:
    """Grayscale → RGB repeat for the PatchGAN (reference :297-301)."""
    return _to_rgb(x)
