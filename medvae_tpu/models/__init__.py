from medvae_tpu.models.base_vae import BaseVAE
from medvae_tpu.models.beta_vae import BetaVAE
from medvae_tpu.models.conditional_vae import ConditionalVAE, FiLMLayer
from medvae_tpu.models.disentangled_conditional_vae import (
    MODALITY_CHANNEL_MAP,
    DisentangledConditionalVAE,
)
from medvae_tpu.nn.discriminator import NLayerDiscriminator

__all__ = [
    "BaseVAE",
    "BetaVAE",
    "ConditionalVAE",
    "FiLMLayer",
    "DisentangledConditionalVAE",
    "MODALITY_CHANNEL_MAP",
    "NLayerDiscriminator",
]
