"""Disentangled conditional VAE walkthrough (script form of the reference's
notebooks/conditional_disentangled_vae_interactive.ipynb explorer).

Trains the flagship DisentangledConditionalVAE briefly on the 5-modality mix,
then:
  * reconstructs a mixed-modality validation batch
  * generates per-modality conditional samples
  * swaps z_modality between two modalities (disentanglement probe)
  * reports modality-separation statistics (centroid distances, silhouette)

Run:  python examples/disentangled_vae_walkthrough.py [--device cpu]
Figures land in ./examples_out/disentangled/.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--limit_batches", type=int, default=40)
    p.add_argument("--out", default="examples_out/disentangled")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from medvae_tpu.analysis import centroid_distance_matrix, silhouette_score
    from medvae_tpu.cli.train import default_config_dir
    from medvae_tpu.config import compose
    from medvae_tpu.data.medmnist import MODALITY_NAMES
    from medvae_tpu.data.pipeline import DeviceFeeder, normalize_and_augment
    from medvae_tpu.train.trainer import Trainer
    from medvae_tpu.utils.visualization import plot_reconstructions, save_image_grid

    os.makedirs(args.out, exist_ok=True)

    cfg = compose(
        default_config_dir(),
        overrides=[
            "experiment=disentangled_multi_modal_cvae_quick",
            f"training.max_epochs={args.epochs}",
            f"+training.limit_train_batches={args.limit_batches}",
            "early_stopping.enabled=false",
            "data.batch_size=64",
        ],
    )
    trainer = Trainer(cfg)
    trainer.fit()
    model, state = trainer.model, trainer.state
    variables = {"params": jax.device_get(state.params)}

    # --- mixed-modality reconstruction --------------------------------------
    feeder = DeviceFeeder(
        trainer.datamodule.val_arrays, 16, trainer.mesh, shuffle=True,
        drop_last=False,
    )
    batch = next(iter(feeder.epoch(0)))
    x = normalize_and_augment(batch["image_u8"], None, augment=False,
                              dtype=model.dtype)
    midx = batch["modality_idx"]
    out = model.apply(
        variables, x, midx, return_latents=True,
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    plot_reconstructions(
        np.asarray(x), np.asarray(out["reconstruction"]),
        os.path.join(args.out, "reconstructions.png"),
    )

    # --- per-modality conditional samples ------------------------------------
    for m in range(model.num_modalities):
        imgs = model.apply(
            variables, 8, jnp.full((8,), m, jnp.int32), jax.random.PRNGKey(m),
            method=model.sample_conditional,
        )
        save_image_grid(
            np.asarray(imgs),
            os.path.join(args.out, f"samples_{MODALITY_NAMES[m]}.png"),
        )

    # --- modality-code swap (disentanglement probe) --------------------------
    z_s, z_m = model.apply(variables, out["z"], method=model.partition_latent)
    swapped = model.apply(
        variables, z_s, z_m[::-1], method=model.reconstruct_latent
    )
    decoded = model.apply(variables, swapped, midx[::-1], method=model.decode)
    save_image_grid(np.asarray(decoded), os.path.join(args.out, "modality_swap.png"))

    # --- separation statistics ------------------------------------------------
    dists, counts = centroid_distance_matrix(z_m, midx, model.num_modalities)
    sil = float(silhouette_score(z_m, midx, model.num_modalities))
    present = np.asarray(counts) > 0
    pair = (
        np.triu(np.ones_like(np.asarray(dists), bool), 1)
        & present[:, None]
        & present[None, :]
    )
    print(f"mean centroid distance: {float(np.asarray(dists)[pair].mean()):.3f}")
    print(f"silhouette score:       {sil:.3f}")
    print(f"figures in {args.out}/")


if __name__ == "__main__":
    main()
