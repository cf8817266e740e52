from medvae_tpu.nn.blocks import (
    AttnBlock,
    Downsample,
    GroupNormSwish,
    LinAttnBlock,
    LinearAttention,
    ResnetBlock,
    Upsample,
    group_norm,
    make_attn,
    swish,
)
from medvae_tpu.nn.encoder_decoder import Decoder, Encoder
from medvae_tpu.nn.discriminator import NLayerDiscriminator

__all__ = [
    "AttnBlock",
    "Downsample",
    "GroupNormSwish",
    "LinAttnBlock",
    "LinearAttention",
    "ResnetBlock",
    "Upsample",
    "group_norm",
    "make_attn",
    "swish",
    "Encoder",
    "Decoder",
    "NLayerDiscriminator",
]
