"""Beta-VAE — BaseVAE with β-weighted KL (reference src/models/beta_vae.py:13-43).

The β weighting itself is applied by the loss (losses/elbo.py reads `model.beta`);
the forward pass is identical to BaseVAE.
"""

from __future__ import annotations

from medvae_tpu.models.base_vae import BaseVAE


class BetaVAE(BaseVAE):
    beta: float = 4.0
