"""Analysis tests: PCA/silhouette/centroids vs sklearn, FID sanity, MIG,
interpolation."""

import numpy as np
import jax.numpy as jnp
import pytest

from medvae_tpu.analysis import (
    centroid_distance_matrix,
    compute_classification_metrics,
    compute_disentanglement_metrics,
    fid_score,
    fid_score_reference_quirk,
    latent_interpolation,
    pairwise_distances,
    pca,
    silhouette_score,
)


def _clusters(n_per=50, d=8, sep=6.0, k=3, seed=0):
    rs = np.random.RandomState(seed)
    z = np.concatenate(
        [rs.randn(n_per, d) + sep * i for i in range(k)]
    ).astype(np.float32)
    labels = np.repeat(np.arange(k), n_per)
    return z, labels


def test_pairwise_distances_matches_scipy():
    from scipy.spatial.distance import squareform, pdist

    rs = np.random.RandomState(0)
    x = rs.randn(20, 5).astype(np.float32)
    ours = np.asarray(pairwise_distances(jnp.asarray(x)))
    ref = squareform(pdist(x))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_silhouette_matches_sklearn():
    from sklearn.metrics import silhouette_score as sk_sil

    z, labels = _clusters()
    ours = float(silhouette_score(jnp.asarray(z), jnp.asarray(labels), 3))
    ref = float(sk_sil(z, labels))
    assert abs(ours - ref) < 1e-3
    assert ours > 0.5  # well separated clusters


def test_pca_matches_sklearn_variance():
    from sklearn.decomposition import PCA as SkPCA

    rs = np.random.RandomState(1)
    x = rs.randn(100, 10).astype(np.float32) * np.arange(1, 11)
    proj, ratio = pca(jnp.asarray(x), 2)
    sk = SkPCA(2).fit(x)
    np.testing.assert_allclose(
        np.sort(np.asarray(ratio)), np.sort(sk.explained_variance_ratio_),
        atol=1e-3,
    )
    assert proj.shape == (100, 2)


def test_centroid_distances():
    z, labels = _clusters(sep=4.0, d=4, k=2)
    d, counts = centroid_distance_matrix(jnp.asarray(z), jnp.asarray(labels), 3)
    d = np.asarray(d)
    expected = 4.0 * 2  # offset 4 in each of 4 dims → ‖·‖ = 4·√4
    assert abs(d[0, 1] - expected) < 0.5
    assert np.asarray(counts)[2] == 0  # absent class


def test_fid_zero_for_identical_and_positive_for_shifted():
    rs = np.random.RandomState(0)
    a = rs.randn(500, 16).astype(np.float32)
    assert abs(fid_score(a, a.copy())) < 1e-2
    b = a + 3.0
    f = fid_score(a, b)
    assert abs(f - 9.0 * 16) < 2.0  # mean-shift term dominates: ‖μ diff‖² = 144
    # quirk variant runs and differs in general
    fq = fid_score_reference_quirk(a, b)
    assert np.isfinite(fq)


def test_mig_and_probe_detect_aligned_factor():
    rs = np.random.RandomState(0)
    factor = rs.rand(300)
    latents = np.stack(
        [factor * 2.0, rs.rand(300), rs.rand(300), rs.rand(300)], axis=1
    )
    m = compute_disentanglement_metrics(latents, factor[:, None])
    assert m["mig"] > 0.5  # one latent dominates the factor
    assert m["beta_vae_metric"] > 0.9  # linearly decodable


def test_classification_metrics():
    logits = np.array([[2.0, -1.0], [-1.0, 2.0], [2.0, -1.0], [2.0, -1.0]])
    targets = np.array([0, 1, 0, 1])
    m = compute_classification_metrics(logits, targets, num_classes=2)
    assert abs(m["accuracy"] - 0.75) < 1e-6
    ml = compute_classification_metrics(
        np.array([[5.0, -5.0], [-5.0, 5.0]]),
        np.array([[1, 0], [0, 1]]),
        num_classes=2,
        task_type="multilabel",
    )
    assert ml["accuracy"] == 1.0


def test_latent_interpolation():
    a = jnp.zeros((4, 4))
    b = jnp.ones((4, 4))
    path = latent_interpolation(a, b, steps=5)
    assert path.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(path[2]), 0.5, atol=1e-6)
