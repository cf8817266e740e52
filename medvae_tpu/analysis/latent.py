"""Batched on-device latent-space analytics.

Parity: the reference's latent analyses run per-sample through NumPy/sklearn on
host (analyze_latent_space.py:129-252 — PCA, t-SNE, centroid pdist heatmaps,
silhouette scores, variance bars; quick_generate interpolations). Here the
linear-algebra parts (PCA via covariance eigendecomposition, pairwise
distances, centroid matrices, silhouette) are jnp and run batched on the
accelerator; only t-SNE (inherently iterative, sklearn) and plotting stay on
host (utils/visualization.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_distances(x: jax.Array) -> jax.Array:
    """(N, D) → (N, N) Euclidean distances (scipy.pdist equivalent, squareform)."""
    x = x.astype(jnp.float32)
    sq = jnp.sum(jnp.square(x), axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    d2 = jnp.maximum(d2, 0.0)
    # fp32 cancellation leaves ~1e-3 junk on the diagonal; it is exactly 0
    d2 = d2 * (1.0 - jnp.eye(x.shape[0], dtype=jnp.float32))
    return jnp.sqrt(d2)


def centroid_distance_matrix(
    z: jax.Array, labels: jax.Array, num_classes: int
) -> Tuple[jax.Array, jax.Array]:
    """Per-class centroids of z and their pairwise distance matrix
    (analyze_latent_space.py:200-216). Returns (distances[M,M], counts[M])."""
    z = z.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    counts = onehot.sum(axis=0)
    centroids = (onehot.T @ z) / jnp.maximum(counts, 1.0)[:, None]
    return pairwise_distances(centroids), counts


def pca(x: jax.Array, n_components: int = 2) -> Tuple[jax.Array, jax.Array]:
    """PCA via eigendecomposition of the covariance (device-friendly).
    Returns (projected[N,k], explained_variance_ratio[k])."""
    x = x.astype(jnp.float32)
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    cov = (xc.T @ xc) / jnp.maximum(x.shape[0] - 1, 1)
    eigvals, eigvecs = jnp.linalg.eigh(cov)  # ascending
    idx = jnp.argsort(eigvals)[::-1][:n_components]
    components = eigvecs[:, idx]
    ratio = eigvals[idx] / jnp.maximum(jnp.sum(eigvals), 1e-12)
    return xc @ components, ratio


def silhouette_score(z: jax.Array, labels: jax.Array, num_classes: int) -> jax.Array:
    """Mean silhouette coefficient, fully vectorized (sklearn-equivalent):
    s_i = (b_i − a_i)/max(a_i, b_i), a = mean intra-cluster distance,
    b = min over other clusters of mean distance to that cluster."""
    d = pairwise_distances(z)  # (N, N)
    n = z.shape[0]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)  # (N, M)
    counts = onehot.sum(axis=0)  # (M,)
    # sum of distances from each point to each cluster: (N, M)
    sums = d @ onehot
    own_counts = counts[labels]  # (N,)
    a = jnp.where(
        own_counts > 1,
        (sums[jnp.arange(n), labels]) / jnp.maximum(own_counts - 1.0, 1.0),
        0.0,
    )
    mean_other = sums / jnp.maximum(counts, 1.0)[None, :]
    # mask own cluster and empty clusters with +inf before the min
    mask_own = jax.nn.one_hot(labels, num_classes, dtype=bool)
    mask_empty = (counts == 0)[None, :]
    b = jnp.min(
        jnp.where(mask_own | mask_empty, jnp.inf, mean_other), axis=1
    )
    s = jnp.where(
        jnp.isfinite(b) & (own_counts > 1),
        (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12),
        0.0,
    )
    valid = jnp.isfinite(b) & (own_counts > 1)
    return jnp.sum(jnp.where(valid, s, 0.0)) / jnp.maximum(jnp.sum(valid), 1.0)


def latent_interpolation(z_a: jax.Array, z_b: jax.Array, steps: int = 8) -> jax.Array:
    """Linear interpolation path between two latents: (steps, *z.shape)."""
    t = jnp.linspace(0.0, 1.0, steps).reshape(-1, *([1] * z_a.ndim))
    return z_a[None] * (1.0 - t) + z_b[None] * t
