#!/usr/bin/env python
"""Export pretrained torch LPIPS / CLIP weights to medvae_tpu's npz format.

Run this in an environment that has the `lpips` and/or `open_clip_torch`
packages (this build environment has no egress to fetch them — the grafting
hooks in medvae_tpu/losses exist precisely so exported weights can be dropped
in later):

    python scripts/export_torch_weights.py --lpips lpips_alex.npz
    python scripts/export_torch_weights.py --clip-vit clip_vitb32.npz

Then point the losses at the files:

    LPIPSLoss(weights_path="lpips_alex.npz")
    BiomedCLIPLoss(encoder="vit", weights_path="clip_vitb32.npz")

Key format: flat flax param paths joined by '/', conv kernels converted
torch (Co, Ci, kh, kw) → flax (kh, kw, Ci, Co), dense kernels transposed.
"""

from __future__ import annotations

import argparse

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def lpips_arrays_from_state_dict(sd: dict) -> dict:
    """Map an `lpips.LPIPS(net='alex')` state_dict (numpy values) to the flat
    npz arrays LPIPSLoss.load_npz grafts. Split out from export_lpips so the
    mapping is testable without the lpips package (tests/test_weight_graft.py
    drives it with the torch-oracle trunk re-keyed to lpips's layout)."""
    arrays = {}
    # AlexNet trunk: lpips stores it as net.slice{1..5}.<idx>.weight/bias with
    # conv indices 0,3,6,8,10 in torchvision AlexNet.features
    conv_map = {
        ("slice1", "0"): "alex/conv1",
        ("slice2", "3"): "alex/conv2",
        ("slice3", "6"): "alex/conv3",
        ("slice4", "8"): "alex/conv4",
        ("slice5", "10"): "alex/conv5",
    }
    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] == "net" and (parts[1], parts[2]) in conv_map:
            base = conv_map[(parts[1], parts[2])]
            if parts[-1] == "weight":
                arrays[f"params/{base}/kernel"] = _conv(value)
            else:
                arrays[f"params/{base}/bias"] = value
        elif parts[0].startswith("lin") and parts[-1] == "weight":
            # lins are 1×1 convs (1, C, 1, 1) → per-channel weight vector
            idx = parts[0][3:]
            arrays[f"params/lin{idx}"] = value.reshape(-1)
    return arrays


def export_lpips(out_path: str) -> None:
    import lpips  # torch package

    net = lpips.LPIPS(net="alex")
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    arrays = lpips_arrays_from_state_dict(sd)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def clip_vit_arrays_from_state_dict(sd: dict) -> dict:
    """Map an open_clip ViT visual-tower state_dict (numpy values) to the
    flat npz arrays clip_vit.load_npz grafts. Testable without open_clip
    (tests/test_weight_graft.py re-keys the torch-oracle ViT to this layout).
    """
    arrays = {
        "params/patch_embed/kernel": _conv(sd["conv1.weight"]),
        "params/class_embedding": sd["class_embedding"],
        "params/positional_embedding": sd["positional_embedding"],
        "params/ln_pre/scale": sd["ln_pre.weight"],
        "params/ln_pre/bias": sd["ln_pre.bias"],
        "params/ln_post/scale": sd["ln_post.weight"],
        "params/ln_post/bias": sd["ln_post.bias"],
        "params/proj": sd["proj"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        b = f"params/block_{i}"
        arrays[f"{b}/ln1/scale"] = sd[f"{p}.ln_1.weight"]
        arrays[f"{b}/ln1/bias"] = sd[f"{p}.ln_1.bias"]
        arrays[f"{b}/ln2/scale"] = sd[f"{p}.ln_2.weight"]
        arrays[f"{b}/ln2/bias"] = sd[f"{p}.ln_2.bias"]
        # torch MultiheadAttention packs qkv as (3d, d); flax Dense is (d, 3d)
        arrays[f"{b}/attn/qkv/kernel"] = sd[f"{p}.attn.in_proj_weight"].T
        arrays[f"{b}/attn/qkv/bias"] = sd[f"{p}.attn.in_proj_bias"]
        arrays[f"{b}/attn/proj/kernel"] = sd[f"{p}.attn.out_proj.weight"].T
        arrays[f"{b}/attn/proj/bias"] = sd[f"{p}.attn.out_proj.bias"]
        arrays[f"{b}/mlp_fc/kernel"] = sd[f"{p}.mlp.c_fc.weight"].T
        arrays[f"{b}/mlp_fc/bias"] = sd[f"{p}.mlp.c_fc.bias"]
        arrays[f"{b}/mlp_proj/kernel"] = sd[f"{p}.mlp.c_proj.weight"].T
        arrays[f"{b}/mlp_proj/bias"] = sd[f"{p}.mlp.c_proj.bias"]
        i += 1
    return arrays


def export_clip_vit(out_path: str) -> None:
    import open_clip  # torch package

    model, _, _ = open_clip.create_model_and_transforms(
        model_name="ViT-B-32", pretrained="openai"
    )
    visual = model.visual
    sd = {k: v.detach().numpy() for k, v in visual.state_dict().items()}
    arrays = clip_vit_arrays_from_state_dict(sd)
    np.savez(out_path, **arrays)
    print(f"wrote {len(arrays)} arrays to {out_path}")


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--lpips", help="output npz for LPIPS AlexNet weights")
    p.add_argument("--clip-vit", help="output npz for CLIP ViT-B/32 weights")
    args = p.parse_args()
    if args.lpips:
        export_lpips(args.lpips)
    if args.clip_vit:
        export_clip_vit(args.clip_vit)
    if not (args.lpips or args.clip_vit):
        p.print_help()


if __name__ == "__main__":
    main()
