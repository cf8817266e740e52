from medvae_tpu.losses.elbo import DisentangledVAELoss, VAELoss, gaussian_kl
from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss, SimpleCLIPEncoder
from medvae_tpu.losses.gan import LPIPSWithDiscriminator, hinge_d_loss

__all__ = [
    "VAELoss",
    "DisentangledVAELoss",
    "gaussian_kl",
    "LPIPSLoss",
    "BiomedCLIPLoss",
    "SimpleCLIPEncoder",
    "LPIPSWithDiscriminator",
    "hinge_d_loss",
]
