"""Vanilla-VAE walkthrough (script form of the reference's
notebooks/vanilla_vae_interactive.ipynb explorer).

Trains a tiny BaseVAE on ChestMNIST for a couple of epochs, then:
  * reconstructs validation images
  * samples from the prior
  * interpolates between two latents
  * projects the latent space to 2-D

Run:  python examples/vanilla_vae_walkthrough.py [--device cpu] [--epochs 2]
Figures land in ./examples_out/vanilla/.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--device", default="cpu", choices=["cpu", "tpu"])
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--out", default="examples_out/vanilla")
    args = p.parse_args()

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from medvae_tpu.analysis import latent_interpolation, pca
    from medvae_tpu.cli.train import default_config_dir
    from medvae_tpu.config import compose
    from medvae_tpu.data.pipeline import DeviceFeeder, normalize_and_augment
    from medvae_tpu.train.trainer import Trainer
    from medvae_tpu.utils.visualization import (
        plot_latent_space,
        plot_reconstructions,
        plot_samples,
        save_image_grid,
    )

    os.makedirs(args.out, exist_ok=True)

    # --- train a tiny model -------------------------------------------------
    cfg = compose(
        default_config_dir(),
        overrides=[
            "experiment=chest_base_vae_quick",
            f"training.max_epochs={args.epochs}",
            "early_stopping.enabled=false",
        ],
    )
    trainer = Trainer(cfg)
    trainer.fit()
    model, state = trainer.model, trainer.state
    variables = {"params": jax.device_get(state.params)}

    # --- reconstructions ----------------------------------------------------
    feeder = DeviceFeeder(
        trainer.datamodule.val_arrays, 16, trainer.mesh, shuffle=False,
        drop_last=False,
    )
    batch = next(iter(feeder.epoch(0)))
    x = normalize_and_augment(batch["image_u8"], None, augment=False,
                              dtype=model.dtype)
    out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(0)})
    plot_reconstructions(
        np.asarray(x), np.asarray(out["reconstruction"]),
        os.path.join(args.out, "reconstructions.png"),
    )

    # --- prior samples -------------------------------------------------------
    samples = model.apply(variables, 16, jax.random.PRNGKey(1), method=model.sample)
    plot_samples(np.asarray(samples), os.path.join(args.out, "prior_samples.png"))

    # --- latent interpolation -----------------------------------------------
    z = out["mean"]
    path = latent_interpolation(z[0], z[1], steps=8)
    decoded = model.apply(variables, path, method=model.decode)
    save_image_grid(np.asarray(decoded), os.path.join(args.out, "interpolation.png"))

    # --- latent projection ---------------------------------------------------
    z_flat = np.asarray(out["mean"]).reshape(len(x), -1)
    plot_latent_space(
        z_flat, np.asarray(batch["label"]),
        os.path.join(args.out, "latent_pca.png"), method="pca",
    )
    print(f"Walkthrough figures written to {args.out}/")


if __name__ == "__main__":
    main()
