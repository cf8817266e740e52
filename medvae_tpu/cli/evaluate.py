"""`evaluate` entry point — reconstruction/latent metrics over the test split.

Parity: reference evaluate.py:22-223 (load checkpoint + datamodule → loop test
batches → recon/latent metrics aggregated mean/std/min/max → metrics.json +
reconstruction/sample/t-SNE plots). The reference's 4-tuple unpacking bug
(evaluate.py:73-83, SURVEY §2.2) is fixed here: modality batches evaluate
correctly. Metrics run batched on device; aggregation is a tiny host reduce.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.cli.common import load_model_and_params
from medvae_tpu.config import instantiate
from medvae_tpu.core.mesh import create_mesh
from medvae_tpu.data.pipeline import DeviceFeeder, normalize_and_augment
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
from medvae_tpu.train.metrics import kl_metrics, latent_metrics, reconstruction_metrics
from medvae_tpu.utils.visualization import (
    plot_latent_space,
    plot_reconstructions,
    plot_samples,
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Evaluate a trained VAE")
    p.add_argument("--model_path", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--output_dir", default="evaluation")
    p.add_argument("--max_batches", type=int, default=0, help="0 = full split")
    p.add_argument("--split", default="test")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fid", action="store_true",
                   help="FID between real and reconstructed feature distributions")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA weight average (requires "
                        "training.ema_decay > 0)")
    p.add_argument("--mig", action="store_true",
                   help="MIG / beta-VAE probe of latents vs modality factor")
    # reference-CLI compatibility (evaluate.py:180-198): --config_path is the
    # reference's name for --config; --num_samples caps evaluated samples
    # (converted to whole batches); --device cpu forces the host backend
    p.add_argument("--config_path", default=None,
                   help="alias of --config (reference evaluate.py)")
    p.add_argument("--num_samples", type=int, default=0,
                   help="cap evaluated samples (reference evaluate.py); "
                        "0 = full split")
    p.add_argument("--device", default=None,
                   help="cpu forces the host backend; cuda/tpu keep default")
    args = p.parse_args(argv)

    if args.device and args.device.lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    model, params, cfg = load_model_and_params(
        args.model_path, args.config or args.config_path, use_ema=args.use_ema
    )
    variables = {"params": params}
    datamodule = instantiate(cfg["data"])
    datamodule.setup(None)
    banner_fn = getattr(datamodule, "synthetic_banner", None)
    banner = banner_fn("evaluating") if banner_fn else None
    if banner:
        print(banner)
    mesh = create_mesh()
    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    @jax.jit
    def eval_batch(batch, key):
        x = normalize_and_augment(batch["image_u8"], None, augment=False,
                                  dtype=model.dtype)
        if "channels" in batch and datamodule.max_channels > 1:
            mask = (jnp.arange(datamodule.max_channels)[None, :]
                    < batch["channels"][:, None]).astype(x.dtype)
            x = x * mask[:, None, None, :]
        rngs = {"sample": key}
        if isinstance(model, DisentangledConditionalVAE):
            out = model.apply(variables, x, batch["modality_idx"], rngs=rngs)
        elif isinstance(model, ConditionalVAE):
            out = model.apply(variables, x, batch["modality_onehot"], rngs=rngs)
        else:
            out = model.apply(variables, x, rngs=rngs)
        m = {}
        m.update(reconstruction_metrics(out["reconstruction"], x, batch["valid"]))
        m.update(kl_metrics(out["mean"], out["logvar"], batch["valid"]))
        m.update(latent_metrics(out["z"], batch["valid"]))
        # per-modality PSNR sums (valid-masked): mixed-modality global means
        # hide per-modality regressions (same breakdown the trainer logs as
        # val/psnr_<modality>, train/step.py)
        from medvae_tpu.train.metrics import psnr as _psnr

        onehot = jax.nn.one_hot(batch["modality_idx"], 12, dtype=jnp.float32)
        onehot = onehot * batch["valid"][:, None]
        per_sample = _psnr(
            out["reconstruction"].astype(jnp.float32), x.astype(jnp.float32)
        )
        m["_psnr_by_mod"] = jnp.sum(per_sample[:, None] * onehot, axis=0)
        m["_count_by_mod"] = jnp.sum(onehot, axis=0)
        return m, x, out["reconstruction"], out["mean"]

    # optional frozen feature extractor for FID (SimpleCLIPEncoder features)
    feat_fn = feat_params = None
    real_feats: List[np.ndarray] = []
    fake_feats: List[np.ndarray] = []
    if args.fid:
        from medvae_tpu.losses.perceptual import BiomedCLIPLoss

        bc = BiomedCLIPLoss()
        feat_params = bc.init(jax.random.fold_in(rng, 1234))
        feat_fn = jax.jit(lambda p, img: bc._encode(p, img))

    feeder = DeviceFeeder(
        datamodule.split(args.split), datamodule.batch_size, mesh,
        shuffle=False, drop_last=False, seed=args.seed,
    )
    per_batch: Dict[str, List[float]] = {}
    psnr_by_mod_sum = np.zeros((12,), np.float64)
    count_by_mod = np.zeros((12,), np.float64)
    first_x = first_rec = None
    latents, latent_labels = [], []
    for i, batch in enumerate(feeder.epoch(0)):
        m, x, rec, mean = eval_batch(batch, jax.random.fold_in(rng, i))
        # one device_get for the metric dict (per-key fetches pay one
        # host<->device round trip each — ruinous through a tunneled link)
        fetched = jax.device_get(m)
        psnr_by_mod_sum += np.asarray(fetched.pop("_psnr_by_mod"), np.float64)
        count_by_mod += np.asarray(fetched.pop("_count_by_mod"), np.float64)
        for k, v in fetched.items():
            per_batch.setdefault(k, []).append(float(v))
        if first_x is None:
            first_x = np.asarray(jax.device_get(x))
            first_rec = np.asarray(jax.device_get(rec))
        if len(latents) * datamodule.batch_size < 2000:
            latents.append(np.asarray(jax.device_get(mean)).reshape(mean.shape[0], -1))
            latent_labels.append(np.asarray(jax.device_get(batch["modality_idx"])))
        if feat_fn is not None and len(real_feats) * datamodule.batch_size < 4000:
            valid = np.asarray(jax.device_get(batch["valid"])) > 0
            real_feats.append(
                np.asarray(jax.device_get(feat_fn(feat_params, x)))[valid]
            )
            fake_feats.append(
                np.asarray(jax.device_get(feat_fn(feat_params, rec)))[valid]
            )
        if args.max_batches and i + 1 >= args.max_batches:
            break
        if args.num_samples and (i + 1) * datamodule.batch_size >= args.num_samples:
            break

    # aggregate mean/std/min/max per metric (reference evaluate.py:109-135)
    summary = {}
    for k, vals in per_batch.items():
        a = np.asarray(vals)
        summary[k] = {
            "mean": float(a.mean()),
            "std": float(a.std()),
            "min": float(a.min()),
            "max": float(a.max()),
        }
    from medvae_tpu.data.medmnist import MODALITY_NAMES

    for mi, name in enumerate(MODALITY_NAMES):
        if count_by_mod[mi] > 0:
            summary[f"psnr_{name}"] = {
                "mean": float(psnr_by_mod_sum[mi] / count_by_mod[mi]),
                "count": int(count_by_mod[mi]),
            }
    if args.fid and real_feats:
        from medvae_tpu.analysis import fid_score

        summary["fid_recon"] = {
            "value": fid_score(np.concatenate(real_feats), np.concatenate(fake_feats))
        }
    if args.mig and latents:
        from medvae_tpu.analysis import compute_disentanglement_metrics

        dm = compute_disentanglement_metrics(
            np.concatenate(latents), np.concatenate(latent_labels)[:, None]
        )
        summary["mig"] = {"value": dm["mig"]}
        summary["beta_vae_metric"] = {"value": dm["beta_vae_metric"]}

    with open(os.path.join(args.output_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # plots (reference evaluate.py:137-168)
    plot_reconstructions(
        first_x, first_rec, os.path.join(args.output_dir, "reconstructions.png")
    )
    n_prior = 16
    if isinstance(model, DisentangledConditionalVAE):
        midx = jnp.asarray(np.arange(n_prior) % model.num_modalities, jnp.int32)
        samples = model.apply(variables, n_prior, midx, rng,
                              method=model.sample_conditional)
    elif isinstance(model, ConditionalVAE):
        cond = jnp.zeros((n_prior, model.cond_dim))
        samples = model.apply(variables, n_prior, cond, rng,
                              method=model.conditional_sample)
    else:
        samples = model.apply(variables, n_prior, rng, method=model.sample)
    plot_samples(
        np.asarray(jax.device_get(samples)),
        os.path.join(args.output_dir, "prior_samples.png"),
        title="Prior samples",
    )
    if latents:
        plot_latent_space(
            np.concatenate(latents),
            np.concatenate(latent_labels),
            os.path.join(args.output_dir, "latent_tsne.png"),
            method="tsne",
        )

    print(
        json.dumps(
            {k: v.get("mean", v.get("value")) for k, v in summary.items()},
            indent=2,
        )
    )
    print(f"Saved evaluation to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
