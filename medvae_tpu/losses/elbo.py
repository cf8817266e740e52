"""ELBO-family losses as pure jit-able functions.

Parity targets:
  * VAELoss (reference src/losses/vae_losses.py:17-64): mse/l1/bce reconstruction
    + mean KL(posterior ‖ N(0,1)), with recon/kl weights. The reference builds
    torch.distributions.Normal objects and calls kl_divergence; here the same
    quantity is computed analytically so the whole loss fuses into one XLA graph:
      KL(N(μ, σ) ‖ N(0,1)) = −½·(1 + log σ² − μ² − σ²)   elementwise, then mean.
  * BetaVAE.compute_loss (src/models/beta_vae.py:13-43): KL weighted by β.
  * DisentangledVAELoss (src/models/disentangled_conditional_vae.py:485-573):
    recon + KL summed over elements / numel(targets) + weighted separation and
    contrastive terms, every term scrubbed of NaN/Inf (:528-565) — scrubbing is
    fused `nan_to_num`, not per-step host checks.

All losses return fp32 scalars in a dict {"loss", "recon_loss", "kl_loss", ...}.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


def gaussian_kl(mean: jax.Array, logvar: jax.Array) -> jax.Array:
    """Elementwise KL(N(mean, exp(½logvar)) ‖ N(0,1)) — matches
    torch.distributions.kl_divergence for diagonal Gaussians."""
    mean = mean.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    return -0.5 * (1.0 + logvar - jnp.square(mean) - jnp.exp(logvar))


def _recon_loss(recon: jax.Array, target: jax.Array, kind: str) -> jax.Array:
    recon = recon.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if kind == "mse":
        return jnp.mean(jnp.square(recon - target))
    if kind == "l1":
        return jnp.mean(jnp.abs(recon - target))
    if kind == "bce":
        # binary_cross_entropy_with_logits, mean reduction
        return jnp.mean(
            jnp.maximum(recon, 0) - recon * target + jnp.log1p(jnp.exp(-jnp.abs(recon)))
        )
    raise ValueError(f"Unknown reconstruction loss type: {kind}")


def _scrub(x: jax.Array, replacement: float = 0.0) -> jax.Array:
    """Replace NaN/Inf with a finite value (reference's per-term guards)."""
    return jnp.nan_to_num(x, nan=replacement, posinf=replacement, neginf=replacement)


@dataclasses.dataclass(frozen=True)
class VAELoss:
    """recon + KL, optionally β-scaled (covers VAELoss and BetaVAE)."""

    recon_loss_type: str = "mse"
    kl_weight: float = 1.0
    recon_weight: float = 1.0
    beta: float = 1.0  # BetaVAE multiplies the KL term by β

    def __call__(
        self, outputs: Dict[str, jax.Array], targets: jax.Array
    ) -> Dict[str, jax.Array]:
        recon = _recon_loss(outputs["reconstruction"], targets, self.recon_loss_type)
        kl = jnp.mean(gaussian_kl(outputs["mean"], outputs["logvar"]))
        total = self.recon_weight * recon + self.kl_weight * self.beta * kl
        return {"loss": total, "recon_loss": recon, "kl_loss": kl}


@dataclasses.dataclass(frozen=True)
class DisentangledVAELoss:
    """recon + KL/numel + separation + contrastive, NaN-proof (reference :485-573)."""

    recon_loss_type: str = "mse"
    kl_weight: float = 1.0
    recon_weight: float = 1.0
    separation_weight: float = 0.1
    contrastive_weight: float = 0.05

    def __call__(
        self, outputs: Dict[str, jax.Array], targets: jax.Array
    ) -> Dict[str, jax.Array]:
        recon = _scrub(
            _recon_loss(outputs["reconstruction"], targets, self.recon_loss_type)
        )
        # KL summed over all elements, normalized by target numel (reference :524-525)
        kl = jnp.sum(gaussian_kl(outputs["mu"], outputs["logvar"]))
        kl = _scrub(kl / targets.size)
        separation = _scrub(outputs["separation_loss"].astype(jnp.float32))
        contrastive = _scrub(outputs["contrastive_loss"].astype(jnp.float32))

        total = (
            self.recon_weight * recon
            + self.kl_weight * kl
            + self.separation_weight * separation
            + self.contrastive_weight * contrastive
        )
        # final guard: a non-finite total becomes a large-but-finite sentinel
        total = jnp.nan_to_num(total, nan=1e6, posinf=1e6, neginf=1e6)
        return {
            "loss": total,
            "recon_loss": recon,
            "kl_loss": kl,
            "separation_loss": separation,
            "contrastive_loss": contrastive,
        }
