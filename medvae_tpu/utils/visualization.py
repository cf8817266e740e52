"""Host-side visualization (matplotlib/sklearn gated — headless-safe).

Parity: reference src/utils/visualization.py (plot_reconstructions :14-66,
plot_samples :69-122, plot_latent_space :125-202, plot_loss_curves :205-246)
plus PNG grid saving used by generate.py. Images arrive as NHWC arrays in
[−1,1] or [0,1]; everything here is numpy — no device work.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def to_unit(images: np.ndarray, from_range: str = "auto") -> np.ndarray:
    """Rescale to [0,1] for display (reference rescales (x+1)/2)."""
    images = np.asarray(images, np.float32)
    if from_range == "auto":
        from_range = "[-1,1]" if images.min() < -0.01 else "[0,1]"
    if from_range == "[-1,1]":
        images = (images + 1.0) / 2.0
    return np.clip(images, 0.0, 1.0)


def _imshow(ax, img: np.ndarray):
    img = to_unit(img)
    if img.shape[-1] == 1:
        ax.imshow(img[..., 0], cmap="gray")
    else:
        ax.imshow(img)
    ax.axis("off")


def plot_reconstructions(
    originals: np.ndarray,
    reconstructions: np.ndarray,
    save_path: Optional[str] = None,
    num_samples: int = 8,
):
    plt = _mpl()
    n = min(num_samples, len(originals))
    fig, axes = plt.subplots(2, n, figsize=(2 * n, 4.5))
    if n == 1:
        axes = axes.reshape(2, 1)
    for i in range(n):
        _imshow(axes[0, i], originals[i])
        _imshow(axes[1, i], reconstructions[i])
    axes[0, 0].set_title("Original", loc="left")
    axes[1, 0].set_title("Reconstruction", loc="left")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return None if save_path else fig


def plot_samples(
    samples: np.ndarray,
    save_path: Optional[str] = None,
    grid: Optional[tuple] = None,
    title: str = "Samples",
):
    plt = _mpl()
    n = len(samples)
    if grid is None:
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
    else:
        rows, cols = grid
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    axes = np.atleast_1d(axes).reshape(rows, cols)
    for i in range(rows * cols):
        ax = axes[i // cols, i % cols]
        if i < n:
            _imshow(ax, samples[i])
        else:
            ax.axis("off")
    fig.suptitle(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return None if save_path else fig


def plot_latent_space(
    latents: np.ndarray,
    labels: np.ndarray,
    save_path: Optional[str] = None,
    method: str = "tsne",
    title: str = "Latent space",
):
    """2-D latent scatter colored by label; t-SNE (sklearn) or PCA projection
    (reference visualization.py:125-202)."""
    plt = _mpl()
    z = np.asarray(latents, np.float32).reshape(len(latents), -1)
    if z.shape[1] > 2:
        if method == "tsne":
            from sklearn.manifold import TSNE

            perplexity = max(2, min(30, len(z) // 4))
            z2 = TSNE(
                n_components=2, perplexity=perplexity, random_state=42, init="pca"
            ).fit_transform(z)
        else:
            from medvae_tpu.analysis.latent import pca

            z2 = np.asarray(pca(z, 2)[0])
    else:
        z2 = z
    fig, ax = plt.subplots(figsize=(7, 6))
    sc = ax.scatter(z2[:, 0], z2[:, 1], c=np.asarray(labels), cmap="tab10", s=8, alpha=0.7)
    fig.colorbar(sc, ax=ax, label="label")
    ax.set_title(f"{title} ({method})")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return None if save_path else fig


def plot_loss_curves(
    history: Dict[str, Sequence[float]],
    save_path: Optional[str] = None,
):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(8, 5))
    for name, values in history.items():
        ax.plot(values, label=name)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend()
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120, bbox_inches="tight")
        plt.close(fig)
    return None if save_path else fig


def save_image_grid(
    images: np.ndarray, path: str, pad: int = 2, cols: "int | None" = None
) -> None:
    """Tile images into one PNG (torchvision.make_grid equivalent) via PIL.

    `cols` fixes the number of columns (e.g. one interpolation path per row);
    default is a near-square layout."""
    from PIL import Image

    imgs = to_unit(images)
    n, h, w, c = imgs.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    canvas = np.ones((rows * (h + pad) + pad, cols * (w + pad) + pad, 3), np.float32)
    for i in range(n):
        r, cc = i // cols, i % cols
        img = imgs[i]
        if img.shape[-1] == 1:
            img = np.repeat(img, 3, axis=-1)
        y0 = pad + r * (h + pad)
        x0 = pad + cc * (w + pad)
        canvas[y0 : y0 + h, x0 : x0 + w] = img[..., :3]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((canvas * 255).astype(np.uint8)).save(path)


def save_image(image: np.ndarray, path: str) -> None:
    from PIL import Image

    img = to_unit(image)
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((img * 255).astype(np.uint8)).save(path)
