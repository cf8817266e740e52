"""Import reference (PyTorch Lightning) checkpoints into this framework.

A user of the reference repo has `.ckpt` files produced by
`VAELightningModule` (reference src/lightning_module.py:18-552, saved by
Lightning's ModelCheckpoint). This module converts such a checkpoint into our
orbax format so trained models migrate without retraining:

  * torch NCHW conv kernels  -> NHWC/HWIO flax kernels
  * torch Linear (out, in)   -> flax Dense kernel (in, out)
  * per-modality ModuleDict/ModuleList heads of the disentangled model
    (reference src/models/disentangled_conditional_vae.py:80-110) -> our
    stacked/grouped-conv equivalents (models/disentangled_conditional_vae.py)
  * norm `weight` -> `scale`

Covered model families: BaseVAE / BetaVAE (encoder+decoder), ConditionalVAE
(`concat` conditioning incl. `condition_proj`), DisentangledConditionalVAE
(input/output projectors, modality embedding, decoder heads). Keys that have
no counterpart here (frozen LPIPS/CLIP nets, the GAN discriminator, Lightning
bookkeeping) are skipped and reported. Unmatched *model* keys raise, so a
silent partial import is impossible.

No torch import is required at conversion time: `torch.load` happens only in
`import_lightning_checkpoint`, and the tensor mapping itself runs on numpy
arrays.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Lightning-module attributes that are not part of the VAE itself.
_SKIP_PREFIXES = (
    "criterion.",
    "loss.",
    "perceptual_loss.",
    "biomed_clip_loss.",
    "discriminator.",
)


def _encdec_path(parts: List[str]) -> Tuple[str, ...]:
    """Map a torch encoder/decoder sub-key (without the leading
    `encoder.`/`decoder.`) to the flax module path, mirroring the reference
    layout (src/models/encoder_decoder.py): `down.0.block.1.*` ->
    `down_0_block_1.*`, `mid.attn_1.*` -> `mid_attn_1.*`."""
    p = parts[-1]
    mods = parts[:-1]
    if mods and mods[0] in ("down", "up"):
        sub = mods[2]
        if sub in ("block", "attn"):
            return (f"{mods[0]}_{mods[1]}_{sub}_{mods[3]}", *mods[4:], p)
        if sub in ("downsample", "upsample"):
            return (f"{mods[0]}_{mods[1]}_{sub}", *mods[3:], p)
        raise KeyError(".".join(parts))
    if mods and mods[0] == "mid":
        return (f"mid_{mods[1]}", *mods[2:], p)
    return (*mods, p)


def _convert_tensor(value: np.ndarray, leaf: str) -> Tuple[np.ndarray, str]:
    """Torch layout -> flax layout for one tensor."""
    if leaf == "weight":
        if value.ndim == 4:  # conv (Co, Ci, kh, kw) -> (kh, kw, Ci, Co)
            return np.transpose(value, (2, 3, 1, 0)), "kernel"
        if value.ndim == 2:  # linear (out, in) -> (in, out)
            return np.transpose(value), "kernel"
        return value, "scale"  # norm affine
    return value, "bias"


def convert_state_dict(
    state_dict: Dict[str, np.ndarray], jparams: Dict
) -> Tuple[Dict, Dict[str, Any]]:
    """Graft a reference Lightning `state_dict` onto a flax param tree.

    `jparams` must be the init params of the *matching* model config (same
    architecture hyper-parameters). Returns (new_params, report) where report
    lists `mapped`, `skipped` (non-model keys), and asserts zero unmatched
    model keys."""
    import flax

    flat = dict(flax.traverse_util.flatten_dict(jparams, sep="§"))
    mapped: List[str] = []
    skipped: List[str] = []

    # Grouped decoder heads of the disentangled model are assembled from M
    # per-head convs into single (3,3,C,M*C) kernels; stage them separately.
    heads: Dict[Tuple[str, str], Dict[int, np.ndarray]] = {}

    for key, tensor in state_dict.items():
        k = key[len("model.") :] if key.startswith("model.") else key
        if k.startswith(_SKIP_PREFIXES) or key.startswith(_SKIP_PREFIXES):
            skipped.append(key)
            continue
        value = np.asarray(tensor)
        parts = k.split(".")

        if parts[0] in ("encoder", "decoder"):
            sub = _encdec_path(parts[1:])
            value, leaf = _convert_tensor(value, sub[-1])
            candidates = [
                (parts[0], *sub[:-1], leaf),
                # linear attention nests under an extra 'attn' module
                (parts[0], sub[0], "attn", *sub[1:-1], leaf),
            ]
        elif parts[0] == "condition_proj":
            # Sequential(Linear, ReLU, Unflatten) -> our Dense
            value, leaf = _convert_tensor(value, parts[-1])
            candidates = [("condition_proj", leaf)]
        elif parts[0] in (
            "modality_input_projectors",
            "modality_output_projectors",
        ):
            m, leaf_t = parts[1], parts[-1]
            stem = "in_proj" if "input" in parts[0] else "out_proj"
            if leaf_t == "weight":  # 1x1 conv (Co, Ci, 1, 1) -> (Ci, Co)
                value = np.transpose(value[:, :, 0, 0])
                candidates = [(f"{stem}_kernel_{m}",)]
            else:
                candidates = [(f"{stem}_bias_{m}",)]
        elif parts[0] == "modality_embedding":
            # Declared-but-unused in the reference forward (:98); linen only
            # materializes params for modules actually called, so there may
            # be nothing to graft onto — skip in that case.
            if "§".join(("modality_embedding", "embedding")) not in flat:
                skipped.append(key)
                continue
            candidates = [("modality_embedding", "embedding")]
        elif parts[0] == "modality_decoders":
            # ModuleList[m] of Sequential(conv, ReLU, conv) -> heads_conv1/2
            m, seq_idx, leaf_t = int(parts[1]), parts[2], parts[-1]
            conv_name = "heads_conv1" if seq_idx == "0" else "heads_conv2"
            if leaf_t == "weight":
                value = np.transpose(value, (2, 3, 1, 0))
                heads.setdefault((conv_name, "kernel"), {})[m] = value
            else:
                heads.setdefault((conv_name, "bias"), {})[m] = value
            mapped.append(key)
            continue
        else:
            skipped.append(key)
            continue

        for cand in candidates:
            jpath = "§".join(cand)
            if jpath in flat:
                if flat[jpath].shape != value.shape:
                    raise ValueError(
                        f"shape mismatch for {key} -> {cand}: checkpoint "
                        f"{value.shape} vs model {flat[jpath].shape} — wrong "
                        "model config for this checkpoint?"
                    )
                flat[jpath] = jnp.asarray(value, flat[jpath].dtype)
                mapped.append(key)
                break
        else:
            raise KeyError(
                f"torch key {key} has no parameter in the target model "
                f"(tried {candidates}) — wrong model config?"
            )

    # Assemble grouped decoder-head kernels: head m owns output slice
    # [m*C, (m+1)*C) of the fused conv (feature_group_count routing for
    # conv2; plain output concatenation for conv1).
    for (conv_name, leaf), per_head in heads.items():
        jpath = "§".join((conv_name, leaf))
        if jpath not in flat:
            raise KeyError(f"no parameter {jpath} in target model")
        target = flat[jpath]
        ms = sorted(per_head)
        stacked = np.concatenate([per_head[m] for m in ms], axis=-1)
        if stacked.shape != target.shape:
            raise ValueError(
                f"decoder heads {conv_name}: checkpoint assembles to "
                f"{stacked.shape}, model expects {target.shape}"
            )
        flat[jpath] = jnp.asarray(stacked, target.dtype)

    report = {"mapped": mapped, "skipped": skipped}
    return flax.traverse_util.unflatten_dict(flat, sep="§"), report


def import_lightning_checkpoint(
    ckpt_path: str, cfg: Dict[str, Any], output_dir: str
) -> str:
    """Convert a reference Lightning `.ckpt` into an orbax checkpoint dir
    loadable by every CLI here (`load_model_and_params`). `cfg` is a composed
    config whose `model` section matches the checkpoint's architecture.
    Returns the orbax checkpoint path."""
    import orbax.checkpoint as ocp
    import torch
    import yaml

    from medvae_tpu.train.trainer import build_model

    payload = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload)
    state_np = {
        k: v.detach().cpu().numpy()
        for k, v in state_dict.items()
        if hasattr(v, "detach")
    }

    model = build_model(
        cfg["model"],
        precision=cfg.get("precision", "bf16"),
        use_pallas=bool(cfg.get("use_pallas", True)),
    )
    size = int(cfg.get("data", {}).get("size", getattr(model, "resolution", 28)))
    c = int(getattr(model, "input_channels", 3))
    x = jnp.zeros((1, size, size, c), model.dtype)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    from medvae_tpu.models import (
        ConditionalVAE,
        DisentangledConditionalVAE,
    )

    if isinstance(model, DisentangledConditionalVAE):
        variables = model.init(rngs, x, jnp.zeros((1,), jnp.int32))
    elif isinstance(model, ConditionalVAE):
        variables = model.init(rngs, x, jnp.zeros((1, model.cond_dim), model.dtype))
    else:
        variables = model.init(rngs, x)

    params, report = convert_state_dict(state_np, variables["params"])

    os.makedirs(output_dir, exist_ok=True)
    ckpt_dir = os.path.abspath(os.path.join(output_dir, "imported"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, {"params": params}, force=True)
    ckptr.wait_until_finished()  # async save must land before we return
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    n_skip = len(report["skipped"])
    print(
        f"Imported {len(report['mapped'])} tensors from {ckpt_path}"
        + (f" (skipped {n_skip} non-model keys)" if n_skip else "")
    )
    return ckpt_dir
