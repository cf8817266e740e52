"""Shared pretrained-weight grafting for frozen feature towers.

Both perceptual losses load exported torch weights the same way (LPIPS
AlexNet trunk, CLIP ViT image tower — reference vae_losses.py:76-80,
108-119 load them via the lpips/open_clip packages): a flat `a/b/c` → array
npz emitted by scripts/export_torch_weights.py is grafted into the Flax
params pytree. One implementation so match/report/raise semantics cannot
drift between the two."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def graft_npz(params: Dict, path: str, label: str) -> Dict:
    """Graft exported weights (flat 'a/b/c' keys) into a params pytree.

    Raises when nothing matches — a silent no-op graft would train against
    the random tower while claiming pretrained weights. Unmatched npz keys
    are reported (stale exports)."""
    import flax

    flat = dict(flax.traverse_util.flatten_dict(params, sep="/"))
    matched, unmatched = 0, []
    with np.load(path) as z:
        for k in z.files:
            if k in flat:
                flat[k] = jnp.asarray(z[k]).reshape(flat[k].shape)
                matched += 1
            else:
                unmatched.append(k)
    if matched == 0:
        raise ValueError(
            f"weight graft from {path} matched 0 of {len(unmatched)} "
            f"arrays — wrong file or stale export format (expected flat "
            f"'params/...' keys like {sorted(flat)[:3]})"
        )
    print(f"{label} graft: {matched} arrays loaded from {path}")
    if unmatched:
        print(f"{label} graft: ignored unmatched keys: {unmatched}")
    return flax.traverse_util.unflatten_dict(flat, sep="/")
