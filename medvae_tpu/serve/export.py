"""Ahead-of-time model export (StableHLO) for deployment.

Serializes the deterministic reconstruction graph — weights baked in as
constants — to a self-contained artifact via `jax.export`. The artifact can
be reloaded and executed without the model's Python class (or any of this
package's code beyond jax itself), which is the TPU-native analogue of the
reference's torch checkpoint + class-code deployment story
(reference generate.py:39, quick_generate_multimodal.py:83-128's state_dict
surgery): the graph, not the Python, is the deployable unit.

Artifact layout (directory):
  reconstruct.jaxexp   serialized Exported for reconstruct(x_u8, modality_idx)
  sample.jaxexp        serialized Exported for sample(noise, modality_idx)
  meta.json            model family, resolution, batch size, latent shape
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE


def export_model(model, params, out_dir: str, batch_size: int = 8) -> Dict[str, Any]:
    """Export reconstruct + sample graphs at a fixed batch size.

    reconstruct: (uint8 NHWC image batch, int32 modality_idx) -> float32
    recon in [-1, 1] via posterior-mean decode (serving semantics,
    serve/engine.py). sample: (float32 prior noise, int32 modality_idx) ->
    float32 images; noise is an explicit input so the artifact stays a pure
    function (callers own the PRNG).
    """
    variables = {"params": params}
    is_dis = isinstance(model, DisentangledConditionalVAE)
    is_cond = isinstance(model, ConditionalVAE)
    res = int(model.resolution)
    # DisentangledConditionalVAE operates at max_channels (3-wide padded
    # layout); other families use input_channels directly
    cin = int(getattr(model, "max_channels", 0) or model.input_channels)
    r = int(model.encoder_out_res)
    zdim = int(
        getattr(model, "total_latent_dim", 0) or getattr(model, "latent_dim", 0)
    )

    def reconstruct(x_u8, midx):
        x = x_u8.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        x = x.astype(model.dtype)
        if is_dis:
            mean, _ = model.apply(variables, x, midx, method=model.encode)
            out = model.apply(
                variables, mean.astype(model.dtype), midx, method=model.decode
            )
        elif is_cond:
            # width the condition head was built for (may differ from 12)
            onehot = jax.nn.one_hot(
                midx, int(getattr(model, "cond_dim", 12)), dtype=model.dtype
            )
            mean, _ = model.apply(variables, x, onehot, method=model.encode)
            out = model.apply(
                variables, mean.astype(model.dtype), method=model.decode
            )
        else:
            mean, _ = model.apply(variables, x, method=model.encode)
            out = model.apply(
                variables, mean.astype(model.dtype), method=model.decode
            )
        return out.astype(jnp.float32)

    def sample(noise, midx):
        z = noise.astype(model.dtype)
        if is_dis:
            shift = (midx.astype(model.dtype) - 2.0) * 0.3
            z = z + shift[:, None, None, None]
            out = model.apply(variables, z, midx, method=model.decode)
        else:
            out = model.apply(variables, z, method=model.decode)
        return out.astype(jnp.float32)

    os.makedirs(out_dir, exist_ok=True)
    x_spec = jax.ShapeDtypeStruct((batch_size, res, res, cin), jnp.uint8)
    m_spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    z_spec = jax.ShapeDtypeStruct((batch_size, r, r, zdim), jnp.float32)

    exp_r = jax_export.export(jax.jit(reconstruct))(x_spec, m_spec)
    exp_s = jax_export.export(jax.jit(sample))(z_spec, m_spec)
    with open(os.path.join(out_dir, "reconstruct.jaxexp"), "wb") as f:
        f.write(exp_r.serialize())
    with open(os.path.join(out_dir, "sample.jaxexp"), "wb") as f:
        f.write(exp_s.serialize())
    meta = {
        "model": type(model).__name__,
        "resolution": res,
        "input_channels": cin,
        "batch_size": batch_size,
        "latent_shape": [r, r, zdim],
        "platforms": list(exp_r.platforms),
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def load_exported(out_dir: str) -> Dict[str, Any]:
    """Load an exported artifact; returns {'reconstruct', 'sample', 'meta'}.

    The callables run through jax but need no model code: the graph and
    weights live in the artifact.
    """
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)

    def _load(name: str) -> Callable:
        with open(os.path.join(out_dir, name), "rb") as f:
            exp = jax_export.deserialize(f.read())
        # one jit wrapper per artifact: compiled once, cached across calls
        fn = jax.jit(exp.call)
        return lambda *args: np.asarray(fn(*args))

    return {
        "reconstruct": _load("reconstruct.jaxexp"),
        "sample": _load("sample.jaxexp"),
        "meta": meta,
    }
