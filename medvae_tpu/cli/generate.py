"""`generate` entry point — sample images from a trained checkpoint.

Parity: reference generate.py:18-142 (argparse CLI: load checkpoint →
model.sample / conditional_sample / sample_conditional → per-sample PNGs +
grid) and quick_generate_multimodal.py's per-modality grids for the
disentangled model.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.cli.common import load_model_and_params
from medvae_tpu.data.medmnist import MODALITY_NAMES, modality_index
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
from medvae_tpu.utils.visualization import save_image, save_image_grid


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Generate samples from a trained VAE")
    p.add_argument("--model_path", required=True, help="orbax checkpoint directory")
    p.add_argument("--config", default=None, help="run config.yaml (auto-detected)")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--modality", default=None, help="e.g. chestmnist / chest_xray")
    p.add_argument("--output_dir", default="generated")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_seeds", type=int, default=1,
                   help="grids for N consecutive seeds (reference quick_generate)")
    p.add_argument("--use_ema", action="store_true",
                   help="generate from the EMA weight average (requires "
                        "training.ema_decay > 0)")
    p.add_argument("--per_modality", action="store_true",
                   help="one grid per modality (disentangled/conditional models)")
    p.add_argument("--interpolate", type=int, default=0, metavar="STEPS",
                   help="also decode STEPS-point linear interpolation paths "
                        "between prior latent pairs (BASELINE configs item 5; "
                        "analysis.latent_interpolation on device)")
    # reference-CLI compatibility (generate.py:109-126): --device maps cpu to
    # the host backend, anything else keeps the environment's accelerator;
    # --grid_size sets grid columns (reference default 8)
    p.add_argument("--device", default=None,
                   help="cpu forces the host backend; cuda/tpu keep default")
    p.add_argument("--grid_size", type=int, default=None,
                   help="columns in saved grids (reference generate.py)")
    args = p.parse_args(argv)

    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    model, params, _ = load_model_and_params(
        args.model_path, args.config, use_ema=args.use_ema
    )
    variables = {"params": params}
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    n = args.num_samples

    def decode_batchless(images):
        return np.asarray(jax.device_get(images), np.float32)

    if isinstance(model, DisentangledConditionalVAE):
        modalities = (
            [modality_index(args.modality)] if args.modality
            else list(range(model.num_modalities))
        )
        if not args.per_modality and args.modality is None:
            midx = jnp.asarray(np.arange(n) % model.num_modalities, jnp.int32)
            imgs = model.apply(variables, n, midx, rng, method=model.sample_conditional)
            save_image_grid(decode_batchless(imgs), os.path.join(args.output_dir, "samples_grid.png"), cols=args.grid_size)
        for m in modalities:
            midx = jnp.full((n,), m, jnp.int32)
            imgs = decode_batchless(
                model.apply(variables, n, midx, jax.random.fold_in(rng, m),
                            method=model.sample_conditional)
            )
            name = MODALITY_NAMES[m]
            save_image_grid(imgs, os.path.join(args.output_dir, f"samples_{name}.png"), cols=args.grid_size)
            for i in range(min(n, 8)):
                save_image(imgs[i], os.path.join(args.output_dir, f"{name}_{i:03d}.png"))
    elif isinstance(model, ConditionalVAE):
        if args.modality:
            cond = jnp.asarray(model.get_modality_condition(args.modality))
            cond = jnp.tile(cond[None], (n, 1))
        else:
            cond = jnp.zeros((n, model.cond_dim))
        for s in range(args.num_seeds):
            key = jax.random.fold_in(rng, s)
            suffix = f"_seed{args.seed + s}" if args.num_seeds > 1 else ""
            imgs = decode_batchless(
                model.apply(variables, n, cond, key, method=model.conditional_sample)
            )
            save_image_grid(
                imgs, os.path.join(args.output_dir, f"samples_grid{suffix}.png"),
                cols=args.grid_size,
            )
            if s == 0:
                for i in range(min(n, 16)):
                    save_image(
                        imgs[i], os.path.join(args.output_dir, f"sample_{i:03d}.png")
                    )
    else:
        # multi-seed grids mirror the reference quick_generate.py (4 seeds × 16)
        for s in range(args.num_seeds):
            key = jax.random.fold_in(rng, s)
            suffix = f"_seed{args.seed + s}" if args.num_seeds > 1 else ""
            imgs = decode_batchless(model.apply(variables, n, key, method=model.sample))
            save_image_grid(
                imgs, os.path.join(args.output_dir, f"samples_grid{suffix}.png"),
                cols=args.grid_size,
            )
            if s == 0:
                for i in range(min(n, 16)):
                    save_image(
                        imgs[i], os.path.join(args.output_dir, f"sample_{i:03d}.png")
                    )

    if args.interpolate > 1:
        from medvae_tpu.analysis import latent_interpolation

        r = model.encoder_out_res
        ld = (
            model.total_latent_dim
            if isinstance(model, DisentangledConditionalVAE)
            else model.latent_dim
        )
        k_a, k_b = jax.random.split(jax.random.fold_in(rng, 7919))
        rows = []
        n_rows = (
            model.num_modalities
            if isinstance(model, DisentangledConditionalVAE)
            else min(4, n)
        )
        for i in range(n_rows):
            z_a = jax.random.normal(
                jax.random.fold_in(k_a, i), (r, r, ld), model.dtype
            )
            z_b = jax.random.normal(
                jax.random.fold_in(k_b, i), (r, r, ld), model.dtype
            )
            path = latent_interpolation(z_a, z_b, steps=args.interpolate)
            if isinstance(model, DisentangledConditionalVAE):
                midx = jnp.full((args.interpolate,), i, jnp.int32)
                imgs = model.apply(variables, path, midx, method=model.decode)
            else:
                imgs = model.apply(variables, path, method=model.decode)
            rows.append(decode_batchless(imgs))
        grid = np.concatenate(rows, axis=0)
        save_image_grid(
            grid,
            os.path.join(args.output_dir, "interpolation_grid.png"),
            cols=args.interpolate,
        )

    print(f"Saved samples to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
