"""`analyze-latent` entry point — modality-separation audit of the latent space.

Parity: reference analyze_latent_space.py:16-363 and
analyze_latent_space_simple.py (encode ≤N val samples per modality — or draw
conditional samples with --generated — then PCA / t-SNE / raw-2D projections,
centroid pairwise-distance heatmap, silhouette scores, per-dim variance, a
multi-panel figure, an .npz dump, and a textual verdict against the research
memo's thresholds: centroid distance > 10, silhouette > 0.5
(MODALITY_SEPARATION_RESEARCH.md:127-133)).

The linear algebra (PCA, centroid distances, silhouette) runs batched on device
(analysis/latent.py); t-SNE and plotting stay on host.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.analysis.latent import (
    centroid_distance_matrix,
    pca,
    silhouette_score,
)
from medvae_tpu.cli.common import load_model_and_params
from medvae_tpu.config import instantiate
from medvae_tpu.core.mesh import create_mesh
from medvae_tpu.data.medmnist import MODALITY_NAMES
from medvae_tpu.data.pipeline import DeviceFeeder, normalize_and_augment
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE


def _collect_latents(model, variables, datamodule, mesh, per_modality, rng):
    """Encode val samples, bucketing ≤per_modality latents per modality."""
    feeder = DeviceFeeder(
        datamodule.split("val"), datamodule.batch_size, mesh,
        shuffle=False, drop_last=False, seed=0,
    )

    @jax.jit
    def encode_batch(batch, key):
        x = normalize_and_augment(batch["image_u8"], None, augment=False,
                                  dtype=model.dtype)
        if "channels" in batch and datamodule.max_channels > 1:
            mask = (jnp.arange(datamodule.max_channels)[None, :]
                    < batch["channels"][:, None]).astype(x.dtype)
            x = x * mask[:, None, None, :]
        if isinstance(model, DisentangledConditionalVAE):
            mu, _ = model.apply(variables, x, batch["modality_idx"],
                                method=model.encode)
            # z_modality: the designated modality subspace the separation /
            # contrastive losses act on (models/disentangled_conditional_vae
            # .py:partition_latent; ref :195-206)
            _, zm = model.partition_latent(mu)
        elif isinstance(model, ConditionalVAE):
            mu, _ = model.apply(variables, x, batch["modality_onehot"],
                                method=model.encode)
            zm = None
        else:
            mu, _ = model.apply(variables, x, method=model.encode)
            zm = None
        flat = mu.reshape(mu.shape[0], -1)
        return flat, (zm if zm is not None else flat[:, :0])

    buckets: dict[int, list[np.ndarray]] = {}
    zm_buckets: dict[int, list[np.ndarray]] = {}
    for i, batch in enumerate(feeder.epoch(0)):
        mu, zm = encode_batch(batch, jax.random.fold_in(rng, i))
        mu = np.asarray(jax.device_get(mu), np.float32)
        zm = np.asarray(jax.device_get(zm), np.float32)
        midx = np.asarray(jax.device_get(batch["modality_idx"]))
        valid = np.asarray(jax.device_get(batch["valid"])) > 0
        for m in np.unique(midx[valid]):
            have = sum(len(a) for a in buckets.get(int(m), []))
            if have < per_modality:
                sel = (midx == m) & valid
                buckets.setdefault(int(m), []).append(mu[sel][: per_modality - have])
                zm_buckets.setdefault(int(m), []).append(zm[sel][: per_modality - have])
        if all(
            sum(len(a) for a in buckets.get(m, [])) >= per_modality
            for m in np.unique(datamodule.split("val").modality_idx)
        ):
            break
    latents = np.concatenate([np.concatenate(v) for v in buckets.values()])
    labels = np.concatenate(
        [np.full(sum(len(a) for a in v), m) for m, v in buckets.items()]
    )
    zm_latents = np.concatenate([np.concatenate(v) for v in zm_buckets.values()])
    return latents, labels, (zm_latents if zm_latents.shape[1] else None)


def _generate_latents(model, variables, per_modality, rng):
    """Latents of conditional samples (analyze_latent_space_simple.py path)."""
    assert isinstance(model, DisentangledConditionalVAE)
    r = model.encoder_out_res
    zs, labels = [], []
    for m in range(model.num_modalities):
        z = jax.random.normal(
            jax.random.fold_in(rng, m),
            (per_modality, r, r, model.total_latent_dim),
        )
        shift = (float(m) - 2.0) * 0.3
        zs.append(np.asarray(z + shift).reshape(per_modality, -1))
        labels.append(np.full(per_modality, m))
    return np.concatenate(zs), np.concatenate(labels)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Latent-space modality-separation analysis")
    p.add_argument("--model_path", "--checkpoint", dest="model_path",
                   required=True,
                   help="checkpoint dir (--checkpoint: reference "
                        "analyze_latent_space_simple.py alias)")
    p.add_argument("--config", default=None)
    p.add_argument("--samples_per_modality", "--num_samples",
                   dest="samples_per_modality", type=int, default=200,
                   help="samples per modality (--num_samples: reference alias)")
    p.add_argument("--output_dir", default="latent_analysis")
    p.add_argument("--generated", action="store_true",
                   help="analyze sampled latents instead of encoded val data")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    model, params, cfg = load_model_and_params(args.model_path, args.config)
    variables = {"params": params}
    mesh = create_mesh()
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    if args.generated:
        latents, labels = _generate_latents(
            model, variables, args.samples_per_modality, rng
        )
        zm_latents = None
    else:
        datamodule = instantiate(cfg["data"])
        datamodule.setup(None)
        latents, labels, zm_latents = _collect_latents(
            model, variables, datamodule, mesh, args.samples_per_modality, rng
        )

    num_classes = int(labels.max()) + 1
    # device-side analytics
    dists, counts = centroid_distance_matrix(
        jnp.asarray(latents), jnp.asarray(labels), num_classes
    )
    sil = float(silhouette_score(jnp.asarray(latents), jnp.asarray(labels), num_classes))
    proj_pca, evr = pca(jnp.asarray(latents), 2)
    dists = np.asarray(jax.device_get(dists))
    proj_pca = np.asarray(jax.device_get(proj_pca))
    per_dim_var = np.var(latents, axis=0)

    present = np.asarray(jax.device_get(counts)) > 0
    pair_mask = np.triu(np.ones_like(dists, bool), 1) & present[:, None] & present[None, :]
    mean_centroid_dist = float(dists[pair_mask].mean()) if pair_mask.any() else 0.0

    # z_modality subspace metrics (disentangled models): the separation and
    # contrastive losses act only on these dims, so this is the subspace the
    # memo's thresholds describe; full-latent numbers are reported alongside.
    zm_dist = zm_sil = None
    if zm_latents is not None:
        zd, _ = centroid_distance_matrix(
            jnp.asarray(zm_latents), jnp.asarray(labels), num_classes
        )
        zm_sil = float(
            silhouette_score(jnp.asarray(zm_latents), jnp.asarray(labels), num_classes)
        )
        zd = np.asarray(jax.device_get(zd))
        zm_dist = float(zd[pair_mask].mean()) if pair_mask.any() else 0.0

    # figure: PCA / t-SNE / raw-2D scatters, heatmap, variance bars
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(18, 10))
    names = [MODALITY_NAMES[m] if m < len(MODALITY_NAMES) else str(m)
             for m in range(num_classes)]

    def scatter(ax, pts, title):
        for m in range(num_classes):
            sel = labels == m
            if sel.any():
                ax.scatter(pts[sel, 0], pts[sel, 1], s=8, alpha=0.6, label=names[m])
        ax.set_title(title)
        ax.legend(fontsize=7)

    scatter(axes[0, 0], proj_pca, f"PCA (evr {np.asarray(evr).sum():.2f})")
    try:
        from sklearn.manifold import TSNE

        perplexity = max(2, min(30, len(latents) // 4))
        proj_tsne = TSNE(n_components=2, perplexity=perplexity,
                         random_state=42, init="pca").fit_transform(latents)
        scatter(axes[0, 1], proj_tsne, "t-SNE")
    except Exception as e:
        axes[0, 1].set_title(f"t-SNE unavailable: {e}")
        proj_tsne = None
    scatter(axes[0, 2], latents[:, :2], "raw dims 0-1")

    im = axes[1, 0].imshow(dists, cmap="viridis")
    axes[1, 0].set_title("centroid pairwise distances")
    axes[1, 0].set_xticks(range(num_classes), names, rotation=45, fontsize=7)
    axes[1, 0].set_yticks(range(num_classes), names, fontsize=7)
    fig.colorbar(im, ax=axes[1, 0])

    axes[1, 1].bar(np.arange(min(64, len(per_dim_var))), per_dim_var[:64])
    axes[1, 1].set_title("per-dimension latent variance")

    axes[1, 2].axis("off")
    # verdict on the designated modality subspace when the model has one,
    # else on the full latent
    v_dist = zm_dist if zm_dist is not None else mean_centroid_dist
    v_sil = zm_sil if zm_sil is not None else sil
    verdict = (
        "EXCELLENT separation" if v_dist > 10 and v_sil > 0.5
        else "partial separation" if v_dist > 3 or v_sil > 0.2
        else "POOR separation"
    )
    text = (
        f"mean centroid distance: {mean_centroid_dist:.3f}\n"
        f"silhouette score: {sil:.3f}\n"
    )
    if zm_dist is not None:
        text += (
            f"z_modality centroid distance: {zm_dist:.3f}\n"
            f"z_modality silhouette: {zm_sil:.3f}\n"
        )
    text += f"\nverdict: {verdict}\n(targets: dist > 10, silhouette > 0.5)"
    axes[1, 2].text(0.05, 0.5, text, fontsize=12, va="center")
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_dir, "latent_analysis.png"), dpi=120)
    plt.close(fig)

    np.savez(
        os.path.join(args.output_dir, "latent_analysis.npz"),
        latents=latents,
        labels=labels,
        centroid_distances=dists,
        pca=proj_pca,
        **({"tsne": proj_tsne} if proj_tsne is not None else {}),
    )
    results = {
        "mean_centroid_distance": mean_centroid_dist,
        "silhouette_score": sil,
        "verdict": verdict,
    }
    if zm_dist is not None:
        results["zmod_centroid_distance"] = zm_dist
        results["zmod_silhouette_score"] = zm_sil
    with open(os.path.join(args.output_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
