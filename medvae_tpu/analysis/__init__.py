from medvae_tpu.analysis.latent import (
    centroid_distance_matrix,
    latent_interpolation,
    pairwise_distances,
    pca,
    silhouette_score,
)

__all__ = [
    "centroid_distance_matrix",
    "latent_interpolation",
    "pairwise_distances",
    "pca",
    "silhouette_score",
]
