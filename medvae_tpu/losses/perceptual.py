"""Perceptual losses: LPIPS-style deep-feature distance and a CLIP-style
feature-matching loss.

Parity targets:
  * LPIPSLoss (reference src/losses/vae_losses.py:67-94): frozen AlexNet
    feature net from the `lpips` package; inputs scaled to [−1,1], gray→RGB.
    Here the LPIPS computation (per-layer unit-normalized feature diffs →
    1×1 "lin" heads → spatial mean → sum over layers) and the AlexNet conv
    trunk are implemented natively in Flax, and the graph is pinned to the
    lpips package's exact eval math by a torch oracle — value AND
    d(loss)/d(recon) agree to ≤1e-5 with transplanted weights
    (tests/test_perceptual_parity.py). Pretrained torch weights are not
    shippable in this environment (zero egress), so the trunk initializes from
    a fixed-seed random draw — frozen random deep features are a documented,
    well-behaved perceptual metric — and `load_npz` grafts real exported
    weights (scripts/export_torch_weights.py) onto the same tested graph.
  * BiomedCLIPLoss (reference :97-186): open-clip ViT-B-32 image tower with a
    SimpleCLIPEncoder CNN fallback (:189-211). The fallback CNN is implemented
    exactly (it is what the reference actually runs without open_clip);
    preprocessing keeps the reference's resize→center-crop→CLIP-normalize at
    224 (:121-130) and the squared-feature-distance objective (:155-177).

Both losses are frozen: their params live in a separate pytree owned by the
train step and receive no gradients (lax.stop_gradient on application).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# lpips.ScalingLayer constants (the official shift/scale for [-1,1] inputs)
_LPIPS_SHIFT = (-0.030, -0.088, -0.188)
_LPIPS_SCALE = (0.458, 0.448, 0.450)

_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _to_rgb(x: jax.Array) -> jax.Array:
    """(B,H,W,1) → (B,H,W,3) by channel repeat (reference gray→RGB)."""
    if x.shape[-1] == 1:
        return jnp.repeat(x, 3, axis=-1)
    return x


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk emitting the 5 LPIPS tap points (relu1..relu5)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, ...]:
        taps = []
        h = nn.Conv(64, (11, 11), strides=(4, 4), padding=2, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        taps.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.Conv(192, (5, 5), padding=2, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        taps.append(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        h = nn.Conv(384, (3, 3), padding=1, dtype=self.dtype, name="conv3")(h)
        h = nn.relu(h)
        taps.append(h)
        h = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv4")(h)
        h = nn.relu(h)
        taps.append(h)
        h = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="conv5")(h)
        h = nn.relu(h)
        taps.append(h)
        return tuple(taps)


class LPIPSNet(nn.Module):
    """Full LPIPS graph: scaling layer → trunk taps → unit-normalize →
    squared diff → 1×1 lin heads → spatial mean → sum."""

    dtype: jnp.dtype = jnp.float32
    channels: Sequence[int] = (64, 192, 384, 256, 256)

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        shift = jnp.asarray(_LPIPS_SHIFT, self.dtype)
        scale = jnp.asarray(_LPIPS_SCALE, self.dtype)
        trunk = AlexNetFeatures(dtype=self.dtype, name="alex")

        def prep(x):
            return (x - shift) / scale

        fa = trunk(prep(a))
        fb = trunk(prep(b))

        total = jnp.zeros((a.shape[0],), jnp.float32)

        def unit_normalize(x):
            # lpips.normalize_tensor: x / (sqrt(sum(x^2)) + 1e-10) — NB the eps
            # sits OUTSIDE the sqrt (torch-oracle-tested in
            # tests/test_perceptual_parity.py). The channel sum-of-squares
            # accumulates in fp32 regardless of the trunk compute dtype
            # (identical math for the fp32 oracle path; required for bf16
            # taps, whose 8-bit mantissa cannot hold a 64-384-term sum).
            x32 = x.astype(jnp.float32)
            return x32 / (
                jnp.sqrt(jnp.sum(jnp.square(x32), axis=-1, keepdims=True)) + 1e-10
            )

        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = unit_normalize(xa)
            nb = unit_normalize(xb)
            diff = jnp.square(na - nb)
            lin = self.param(
                f"lin{i}",
                nn.initializers.constant(1.0 / self.channels[i]),
                (self.channels[i],),
                jnp.float32,
            )
            # 1×1 conv with non-negative weights (lpips clamps lins ≥ 0)
            d = jnp.einsum("bhwc,c->bhw", diff, jnp.abs(lin))
            total = total + jnp.mean(d, axis=(1, 2))
        return total


class LPIPSLoss:
    """Callable wrapper holding frozen params. API parity with the reference
    LPIPSLoss: inputs in [0,1]-ish model space are rescaled to [−1,1] (:84-86),
    grayscale repeated to RGB (:88-92), result is the batch mean."""

    def __init__(
        self,
        net: str = "alex",
        weights_path: Optional[str] = None,
        dtype: jnp.dtype = jnp.float32,
    ):
        if net != "alex":
            raise NotImplementedError("only the alex trunk is implemented")
        # `dtype` is the trunk COMPUTE dtype (params stay fp32; LPIPS
        # normalize/lin reductions stay fp32 either way). The production
        # train step runs the frozen towers in bf16 (ops/PERF_FLAGSHIP.md);
        # fp32 is the torch-oracle-parity default.
        self.module = LPIPSNet(dtype=jnp.dtype(dtype))
        self._weights_path = weights_path

    def init(self, rng: jax.Array, image_hw: int = 64) -> Dict:
        dummy = jnp.zeros((1, max(image_hw, self.MIN_SIZE), max(image_hw, self.MIN_SIZE), 3))
        params = self.module.init(rng, dummy, dummy)
        if self._weights_path:
            params = self.load_npz(params, self._weights_path)
        return params

    @staticmethod
    def load_npz(params: Dict, path: str) -> Dict:
        """Graft exported pretrained weights (shared semantics: losses/graft.py)."""
        from medvae_tpu.losses.graft import graft_npz

        return graft_npz(params, path, "LPIPS")

    # AlexNet's stride/pool chain produces empty tensors below ~64 px (the
    # torch original has the same constraint — the reference's 28×28 quick
    # configs could never have run its LPIPS path). Small inputs are
    # bilinearly upsampled to this floor first.
    MIN_SIZE = 64

    def __call__(self, params: Dict, inputs: jax.Array, recons: jax.Array) -> jax.Array:
        params = jax.lax.stop_gradient(params)
        a = _to_rgb(inputs) * 2.0 - 1.0
        b = _to_rgb(recons) * 2.0 - 1.0
        if a.shape[1] < self.MIN_SIZE or a.shape[2] < self.MIN_SIZE:
            n, _, _, c = a.shape
            shape = (n, self.MIN_SIZE, self.MIN_SIZE, c)
            a = jax.image.resize(a, shape, method="linear")
            b = jax.image.resize(b, shape, method="linear")
        return jnp.mean(self.module.apply(params, a, b))


class SimpleCLIPEncoder(nn.Module):
    """The reference's CLIP-fallback CNN (vae_losses.py:189-211), in Flax:
    7×7/2 conv → pool → 3×3/2 conv → pool → 3×3/2 conv → GAP → MLP(512)."""

    embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, dtype=self.dtype)(x)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(128, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(256, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype)(h)
        h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))  # adaptive avg-pool to 1×1
        h = nn.relu(nn.Dense(self.embed_dim, dtype=self.dtype)(h))
        return nn.Dense(self.embed_dim, dtype=self.dtype)(h)


class BiomedCLIPLoss:
    """Feature-matching loss between input and reconstruction embeddings.

    Reference semantics (vae_losses.py:135-179): clamp (x+1)/2 to [0,1],
    gray→RGB, resize/center-crop to 224, CLIP-normalize, encode both images,
    squared distance summed over features and averaged over the batch; optional
    latent-feature term (latent/4.6, channel-pooled, upsampled) when
    compute_lat_loss.
    """

    def __init__(
        self,
        compute_rec_loss: bool = True,
        compute_lat_loss: bool = False,
        encoder: str = "simple",
        weights_path: Optional[str] = None,
        dtype: jnp.dtype = jnp.float32,
    ):
        self.compute_rec_loss = compute_rec_loss
        self.compute_lat_loss = compute_lat_loss
        # `dtype` is the tower COMPUTE dtype (params stay fp32; LayerNorms,
        # attention logits, and the feature distance reduce in fp32 either
        # way). bf16 in the production step; fp32 = oracle-parity default.
        dtype = jnp.dtype(dtype)
        if encoder == "vit":
            # ViT-B/32 image tower (the reference's primary open_clip path)
            from medvae_tpu.losses.clip_vit import CLIPViT

            self.module = CLIPViT(dtype=dtype)
        elif encoder == "simple":
            self.module = SimpleCLIPEncoder(dtype=dtype)
        else:
            raise ValueError(f"Unknown clip encoder: {encoder}")
        self._weights_path = weights_path

    def init(self, rng: jax.Array) -> Dict:
        params = self.module.init(rng, jnp.zeros((1, 224, 224, 3)))
        if self._weights_path:
            from medvae_tpu.losses.clip_vit import load_npz

            params = load_npz(params, self._weights_path)
        return params

    def _preprocess(self, img: jax.Array) -> jax.Array:
        img = jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
        img = _to_rgb(img)
        b = img.shape[0]
        # cubic resize only when the shape actually changes: at the native
        # 224² flagship resolution the reference's resize is an identity on
        # shapes, and XLA still materializes the two cubic gather/matmul
        # passes per branch (measured in scripts/profile_flagship.py) —
        # static-shape check, so jit traces the cheap path.
        if img.shape[1:3] != (224, 224):
            img = jax.image.resize(img, (b, 224, 224, 3), method="cubic")
        mean = jnp.asarray(_CLIP_MEAN, img.dtype)
        std = jnp.asarray(_CLIP_STD, img.dtype)
        return (img - mean) / std

    def _encode(self, params: Dict, img: jax.Array) -> jax.Array:
        return self.module.apply(params, self._preprocess(img))

    def __call__(
        self,
        params: Dict,
        img: jax.Array,
        rec: Optional[jax.Array] = None,
        latent: Optional[jax.Array] = None,
    ) -> jax.Array:
        params = jax.lax.stop_gradient(params)
        img_features = self._encode(params, img).astype(jnp.float32)
        total = jnp.asarray(0.0, jnp.float32)
        if self.compute_rec_loss and rec is not None:
            rec_features = self._encode(params, rec).astype(jnp.float32)
            total += jnp.mean(
                jnp.sum(jnp.square(img_features - rec_features), axis=1)
            )
        if self.compute_lat_loss and latent is not None:
            lat = latent / 4.6
            lat = jnp.mean(lat, axis=-1, keepdims=True)  # pool channels (NHWC)
            b = lat.shape[0]
            lat = jax.image.resize(lat, (b, 224, 224, 1), method="linear")
            lat = jnp.repeat(lat, 3, axis=-1)
            lat_features = self.module.apply(params, lat).astype(jnp.float32)
            total += jnp.mean(
                jnp.sum(jnp.square(img_features - lat_features), axis=1)
            )
        return total
