"""On-device evaluation metrics (PSNR / SSIM / MSE / MAE / KL / latent stats).

Parity: reference src/utils/metrics.py:14-101 (torchmetrics PSNR/SSIM, KL
stats, latent mean/std/sparsity). All metrics are jnp, masked by the batch
validity mask (eval tail padding), and accumulated on device — no host sync
per batch (SURVEY §7 throughput note).

SSIM re-creates torchmetrics' algorithm exactly (gaussian 11×11 σ1.5,
population moments, reflect-pad + crop ≡ VALID windows); value and gradient
are pinned against a torch float64 oracle in tests/test_ssim_oracle.py.

data_range quirk: the reference passes data_range=1.0 (metrics.py:39,44)
although its images are normalized to [−1,1] — understating PSNR by 6.02 dB
and shifting SSIM's c1/c2 stabilizers. We default to the correct 2.0; when
comparing val/psnr against reference-logged numbers (e.g. 16.67 dB), add
6.02 dB to theirs or pass data_range=1.0 here.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from medvae_tpu.losses.elbo import gaussian_kl


def _masked_mean(per_sample: jax.Array, valid: Optional[jax.Array]) -> jax.Array:
    if valid is None:
        return jnp.mean(per_sample)
    v = valid.astype(jnp.float32)
    return jnp.sum(per_sample * v) / jnp.maximum(jnp.sum(v), 1.0)


def psnr(
    pred: jax.Array, target: jax.Array, data_range: float = 2.0
) -> jax.Array:
    """Per-sample PSNR in dB (matches torchmetrics PSNR with data_range)."""
    axes = tuple(range(1, pred.ndim))
    mse = jnp.mean(jnp.square(pred - target).astype(jnp.float32), axis=axes)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def ssim(
    pred: jax.Array,
    target: jax.Array,
    data_range: float = 2.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Per-sample SSIM, Gaussian 11×11 window (torchmetrics defaults), NHWC.

    Implemented with depthwise convs so XLA maps the windows onto the conv
    units; channels are averaged at the end like torchmetrics' default.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c = pred.shape[-1]

    half = kernel_size // 2
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / jnp.sum(g)
    window = jnp.outer(g, g)  # (k, k)
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = filt(pred * pred)
    mu_tt = filt(target * target)
    mu_pt = filt(pred * target)

    var_p = mu_pp - mu_p**2
    var_t = mu_tt - mu_t**2
    cov = mu_pt - mu_p * mu_t

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p**2 + mu_t**2 + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def reconstruction_metrics(
    reconstruction: jax.Array,
    target: jax.Array,
    valid: Optional[jax.Array] = None,
    data_range: float = 2.0,
) -> Dict[str, jax.Array]:
    """MSE / MAE / PSNR / SSIM, masked batch means (reference metrics.py:14-45)."""
    axes = tuple(range(1, target.ndim))
    rec = reconstruction.astype(jnp.float32)
    tgt = target.astype(jnp.float32)
    per_mse = jnp.mean(jnp.square(rec - tgt), axis=axes)
    per_mae = jnp.mean(jnp.abs(rec - tgt), axis=axes)
    return {
        "mse": _masked_mean(per_mse, valid),
        "mae": _masked_mean(per_mae, valid),
        "psnr": _masked_mean(psnr(rec, tgt, data_range), valid),
        "ssim": _masked_mean(ssim(rec, tgt, data_range), valid),
    }


def kl_metrics(
    mean: jax.Array, logvar: jax.Array, valid: Optional[jax.Array] = None
) -> Dict[str, jax.Array]:
    """KL statistics (reference metrics.py:48-73): total per-sample KL, its
    batch mean/std, and per-dimension mean."""
    b = mean.shape[0]
    kl_el = gaussian_kl(mean, logvar).reshape(b, -1)
    per_sample_total = jnp.sum(kl_el, axis=1)
    per_dim_mean = jnp.mean(kl_el)
    v = valid.astype(jnp.float32) if valid is not None else jnp.ones((b,), jnp.float32)
    n = jnp.maximum(jnp.sum(v), 1.0)
    mean_total = jnp.sum(per_sample_total * v) / n
    var_total = jnp.sum(jnp.square(per_sample_total - mean_total) * v) / n
    return {
        "kl_total": mean_total,
        "kl_mean": _masked_mean(jnp.mean(kl_el, axis=1), valid),
        "kl_std": jnp.sqrt(jnp.maximum(var_total, 0.0)),
        "kl_per_dim_mean": per_dim_mean,
    }


def latent_metrics(z: jax.Array, valid: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Latent activation stats (reference metrics.py:76-101)."""
    b = z.shape[0]
    z2 = z.reshape(b, -1).astype(jnp.float32)
    sparsity = jnp.mean((jnp.abs(z2) < 0.01).astype(jnp.float32), axis=1)
    return {
        "latent_mean": _masked_mean(jnp.mean(z2, axis=1), valid),
        "latent_std": _masked_mean(jnp.std(z2, axis=1), valid),
        "latent_sparsity": _masked_mean(sparsity, valid),
    }
