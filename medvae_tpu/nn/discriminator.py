"""PatchGAN discriminator.

Parity: reference NLayerDiscriminator (src/models/discriminator.py:11-82):
4×4 stride-2 convs, LeakyReLU(0.2), BatchNorm (GroupNorm(32) when use_actnorm),
final 1-channel logit map. NHWC; BatchNorm via flax with a `batch_stats`
collection handled by the GAN train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class NLayerDiscriminator(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_actnorm: bool = False
    dtype: jnp.dtype = jnp.float32
    # cross-shard sync-BatchNorm axis for explicit shard_map training: under
    # jit+NamedSharding XLA computes BN moments over the GLOBAL batch
    # automatically; inside shard_map the same semantics require pmean over
    # the data axis (flax BatchNorm axis_name). None = local batch.
    bn_axis_name: object = None

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        def norm(h, planes, name):
            if self.use_actnorm:
                return nn.GroupNorm(
                    num_groups=min(32, planes), dtype=jnp.float32, name=name
                )(h)
            return nn.BatchNorm(
                use_running_average=not train,
                dtype=jnp.float32,
                name=name,
                axis_name=self.bn_axis_name,
            )(h)

        use_bias = not self.use_actnorm
        kw, padw = 4, 1

        h = nn.Conv(
            self.ndf,
            (kw, kw),
            strides=(2, 2),
            padding=padw,
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv0",
        )(x)
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = nn.Conv(
                self.ndf * nf_mult,
                (kw, kw),
                strides=(2, 2),
                padding=padw,
                use_bias=use_bias,
                dtype=self.dtype,
                name=f"conv{n}",
            )(h)
            h = norm(h, self.ndf * nf_mult, f"norm{n}")
            h = nn.leaky_relu(h, 0.2)

        nf_mult = min(2**self.n_layers, 8)
        h = nn.Conv(
            self.ndf * nf_mult,
            (kw, kw),
            strides=(1, 1),
            padding=padw,
            use_bias=use_bias,
            dtype=self.dtype,
            name=f"conv{self.n_layers}",
        )(h)
        h = norm(h, self.ndf * nf_mult, f"norm{self.n_layers}")
        h = nn.leaky_relu(h, 0.2)

        return nn.Conv(
            1, (kw, kw), strides=(1, 1), padding=padw, dtype=self.dtype, name="conv_out"
        )(h)
