"""SSIM / PSNR torch-oracle parity.

The reference computes val/ssim and val/psnr with torchmetrics functionals
(src/utils/metrics.py:14-45, data_range=1.0). torchmetrics is not installed
here, so the oracle below re-creates its SSIM algorithm exactly in torch
float64 (torchmetrics/functional/image/ssim.py `_ssim_update`):

  * gaussian 11x11 window, sigma 1.5, k1=0.01, k2=0.03
  * inputs reflect-padded by (kernel-1)//2, depthwise conv, then the SSIM map
    cropped by the same pad — mathematically identical to a VALID conv over
    the unpadded image (every retained window lies fully inside the image),
    which is what medvae_tpu.train.metrics.ssim computes directly
  * biased (population) moments: var = E[x^2] - E[x]^2, no Bessel correction
  * reduction: per-image mean over the cropped map, then batch mean

Value AND gradient are pinned (the SSIM value feeds logged metrics only, but
gradient parity guards the constants: a wrong c1/c2 or window normalization
shows up orders of magnitude above the fp32-vs-fp64 noise floor).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medvae_tpu.train.metrics import psnr, ssim  # noqa: E402


def _gaussian_kernel(kernel_size: int, sigma: float, channels: int, dtype):
    coords = torch.arange(kernel_size, dtype=dtype) - (kernel_size - 1) / 2.0
    g = torch.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    k2d = torch.outer(g, g)
    return k2d.expand(channels, 1, kernel_size, kernel_size).contiguous()


def torchmetrics_ssim(
    preds: torch.Tensor,
    target: torch.Tensor,
    data_range: float,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> torch.Tensor:
    """Per-sample SSIM, NCHW, re-created from torchmetrics `_ssim_update`."""
    c = preds.shape[1]
    pad = (kernel_size - 1) // 2
    kernel = _gaussian_kernel(kernel_size, sigma, c, preds.dtype)

    preds_p = F.pad(preds, (pad, pad, pad, pad), mode="reflect")
    target_p = F.pad(target, (pad, pad, pad, pad), mode="reflect")

    inp = torch.cat(
        [preds_p, target_p, preds_p * preds_p, target_p * target_p,
         preds_p * target_p]
    )
    out = F.conv2d(inp, kernel, groups=c)
    b = preds.shape[0]
    mu_p, mu_t, spp, stt, spt = out.split(b)

    sigma_p = spp - mu_p * mu_p
    sigma_t = stt - mu_t * mu_t
    sigma_pt = spt - mu_p * mu_t

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    upper = 2 * sigma_pt + c2
    lower = sigma_p + sigma_t + c2
    full = ((2 * mu_p * mu_t + c1) * upper) / ((mu_p**2 + mu_t**2 + c1) * lower)
    cropped = full[..., pad:-pad, pad:-pad]
    return cropped.reshape(b, -1).mean(dim=-1)


def _pair(channels: int, seed: int = 0, n: int = 4, hw: int = 28):
    rs = np.random.RandomState(seed)
    x = rs.uniform(-1, 1, (n, hw, hw, channels)).astype(np.float32)
    noise = rs.normal(0, 0.15, x.shape).astype(np.float32)
    y = np.clip(x + noise, -1, 1).astype(np.float32)
    return x, y


@pytest.mark.parametrize("channels", [1, 3])
@pytest.mark.parametrize("data_range", [1.0, 2.0])
def test_ssim_value_matches_torchmetrics_oracle(channels, data_range):
    x, y = _pair(channels, seed=channels)
    ours = np.asarray(ssim(jnp.asarray(y), jnp.asarray(x), data_range))

    xt = torch.from_numpy(x).double().permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).double().permute(0, 3, 1, 2)
    ref = torchmetrics_ssim(yt, xt, data_range).numpy()

    np.testing.assert_allclose(ours, ref, rtol=0, atol=2e-5)
    # sanity: distinct per-sample values, inside (-1, 1]
    assert np.all(ours <= 1.0 + 1e-6)
    assert len(np.unique(np.round(ours, 4))) > 1


def test_ssim_gradient_matches_torchmetrics_oracle():
    x, y = _pair(3, seed=7)
    data_range = 2.0

    g_ours = np.asarray(
        jax.grad(
            lambda p: jnp.mean(ssim(p, jnp.asarray(x), data_range))
        )(jnp.asarray(y))
    )

    xt = torch.from_numpy(x).double().permute(0, 3, 1, 2)
    yt = torch.from_numpy(y).double().permute(0, 3, 1, 2).requires_grad_(True)
    torchmetrics_ssim(yt, xt, data_range).mean().backward()
    g_ref = yt.grad.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(g_ours, g_ref, rtol=0, atol=1e-6)


def test_ssim_identity_and_range():
    x, _ = _pair(1, seed=3)
    np.testing.assert_allclose(
        np.asarray(ssim(jnp.asarray(x), jnp.asarray(x), 2.0)), 1.0, atol=1e-6
    )


@pytest.mark.parametrize("data_range", [1.0, 2.0])
def test_psnr_matches_torch_oracle(data_range):
    x, y = _pair(3, seed=11)
    ours = np.asarray(psnr(jnp.asarray(y), jnp.asarray(x), data_range))
    xt = torch.from_numpy(x).double()
    yt = torch.from_numpy(y).double()
    mse = ((xt - yt) ** 2).mean(dim=(1, 2, 3))
    ref = (10.0 * torch.log10(data_range**2 / mse)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-4)
