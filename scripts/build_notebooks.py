#!/usr/bin/env python
"""Generate the interactive notebooks (parity with /root/reference/notebooks/).

The two reference notebooks are ipywidgets recon/generation explorers
(vanilla_vae_interactive.ipynb: 16 cells; conditional_disentangled_vae_
interactive.ipynb: 21 cells). These are their TPU-framework equivalents:
every cell runs headless end-to-end (CI-lite sizes via MEDVAE_NB_QUICK), and
the widget cells degrade gracefully when ipywidgets/display is unavailable.

Run `python scripts/build_notebooks.py` to (re)generate notebooks/*.ipynb.
Generated notebooks are committed; this script is the reviewable source.
"""

from __future__ import annotations

import os
import sys

import nbformat as nbf

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "notebooks")

SETUP = '''\
# Setup: run headless-safe (CPU by default; set MEDVAE_NB_DEVICE=tpu on a TPU VM)
import os, sys
sys.path.insert(0, os.path.abspath(".."))  # repo root when run from notebooks/
sys.path.insert(0, os.path.abspath("."))

import matplotlib
if not os.environ.get("DISPLAY"):
    matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

import jax
if os.environ.get("MEDVAE_NB_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

QUICK = bool(int(os.environ.get("MEDVAE_NB_QUICK", "1")))  # tiny sizes by default
EPOCH_BATCHES = 10 if QUICK else 200
print(f"devices: {jax.devices()}  quick={QUICK}")
'''


def _vanilla_cells():
    md = nbf.v4.new_markdown_cell
    code = nbf.v4.new_code_cell
    return [
        md(
            "# Vanilla VAE — interactive walkthrough\n\n"
            "TPU-framework twin of the reference's "
            "`notebooks/vanilla_vae_interactive.ipynb`: train a small "
            "`BaseVAE` on ChestMNIST (synthetic fallback when no npz is "
            "present), inspect reconstructions, prior samples, latent "
            "interpolations and a 2-D latent projection, then explore the "
            "latent space with sliders (widget cell is optional)."
        ),
        code(SETUP),
        code(
            '''\
# Data + model
from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate
from medvae_tpu.data.medmnist import MedMNISTDataModule
from medvae_tpu.data.pipeline import DeviceFeeder
from medvae_tpu.models import BaseVAE
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step, make_forward_fn, preprocess

dm = MedMNISTDataModule(dataset_names=["chestmnist"], batch_size=64, size=28,
                        root="./data", synthetic_fallback=True,
                        augment_train=False)
dm.setup("fit")
mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])

model = BaseVAE(input_channels=1, latent_dim=8, hidden_channels=16,
                ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                dropout=0.0, resolution=28)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
variables = jax.jit(model.init)(rngs, jnp.zeros((2, 28, 28, 1)))
print(f"{sum(x.size for x in jax.tree_util.tree_leaves(variables)):,} params")
'''
        ),
        code(
            '''\
# Short training run (the jitted production train step)
tx = build_optimizer({"type": "adam", "lr": 2e-3}, None)
state = replicate(mesh, create_train_state(variables["params"], tx))
step = build_train_step(model, {"type": "vae"}, tx, mesh,
                        augment=False, max_channels=1, donate=False)
feeder = DeviceFeeder(dm.train_arrays, 64, mesh, shuffle=True)
losses = []
for epoch in range(1 if QUICK else 3):
    for i, batch in enumerate(feeder.epoch(epoch)):
        if i >= EPOCH_BATCHES:
            break
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["train/loss"]))
plt.plot(losses); plt.xlabel("step"); plt.ylabel("train/loss"); plt.show()
print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
'''
        ),
        md("## Reconstructions"),
        code(
            '''\
forward = make_forward_fn(model)
val_feeder = DeviceFeeder(dm.val_arrays, 64, mesh, shuffle=False,
                          drop_last=False)
batch = next(iter(val_feeder.epoch(0)))

@jax.jit
def recon_fn(state, batch):
    x = preprocess(batch, None, augment=False, max_channels=1)
    out = forward(state.params, x, batch, {"sample": jax.random.PRNGKey(0)},
                  deterministic=True)
    return x, out["reconstruction"], out["z"]

x, recon, z = jax.device_get(recon_fn(state, batch))
fig, axes = plt.subplots(2, 8, figsize=(14, 4))
for i in range(8):
    axes[0, i].imshow(x[i, ..., 0], cmap="gray"); axes[0, i].axis("off")
    axes[1, i].imshow(recon[i, ..., 0], cmap="gray"); axes[1, i].axis("off")
axes[0, 0].set_title("original", loc="left")
axes[1, 0].set_title("reconstruction", loc="left")
plt.show()
'''
        ),
        md("## Prior samples"),
        code(
            '''\
samples = jax.device_get(model.apply(
    {"params": jax.device_get(state.params)}, 16, jax.random.PRNGKey(3),
    method=model.sample))
fig, axes = plt.subplots(2, 8, figsize=(14, 4))
for i, ax in enumerate(axes.ravel()):
    ax.imshow(samples[i, ..., 0], cmap="gray"); ax.axis("off")
plt.suptitle("prior samples"); plt.show()
'''
        ),
        md("## Latent interpolation"),
        code(
            '''\
za, zb = z[0], z[1]
steps = 8
grid = np.stack([za * (1 - t) + zb * t for t in np.linspace(0, 1, steps)])
decoded = jax.device_get(model.apply(
    {"params": jax.device_get(state.params)}, jnp.asarray(grid),
    method=model.decode))
fig, axes = plt.subplots(1, steps, figsize=(14, 2))
for i, ax in enumerate(axes):
    ax.imshow(decoded[i, ..., 0], cmap="gray"); ax.axis("off")
plt.suptitle("a -> b interpolation"); plt.show()
'''
        ),
        md("## 2-D latent projection"),
        code(
            '''\
zf = z.reshape(len(z), -1)
zc = zf - zf.mean(0)
# PCA via SVD (no sklearn dependency needed here)
_, _, vt = np.linalg.svd(zc, full_matrices=False)
p2 = zc @ vt[:2].T
labels = jax.device_get(batch["label"])
plt.figure(figsize=(5, 4))
plt.scatter(p2[:, 0], p2[:, 1], c=labels, cmap="tab10", s=12)
plt.title("latent PCA"); plt.colorbar(); plt.show()
'''
        ),
        md(
            "## Interactive explorer (optional)\n\n"
            "Sliders over the first latent dimensions; requires `ipywidgets` "
            "in a live kernel — the cell degrades to a static decode "
            "headless."
        ),
        code(
            '''\
host_params = jax.device_get(state.params)
r = model.encoder_out_res

def decode_point(**dims):
    zvec = np.zeros((1, r, r, model.latent_dim), np.float32)
    for name, v in dims.items():
        zvec[..., int(name[1:])] = v
    img = jax.device_get(model.apply({"params": host_params},
                                     jnp.asarray(zvec), method=model.decode))
    plt.figure(figsize=(2.5, 2.5))
    plt.imshow(img[0, ..., 0], cmap="gray"); plt.axis("off"); plt.show()

try:
    import ipywidgets as widgets
    from IPython.display import display
    sliders = {f"z{i}": widgets.FloatSlider(min=-3, max=3, step=0.1, value=0.0,
                                            description=f"z{i}")
               for i in range(min(4, model.latent_dim))}
    out = widgets.interactive_output(decode_point, sliders)
    display(widgets.VBox(list(sliders.values())), out)
except Exception as e:
    print(f"(no live widget frontend: {type(e).__name__}) static decode:")
    decode_point(z0=1.5, z1=-1.0)
'''
        ),
    ]


def _disentangled_cells():
    md = nbf.v4.new_markdown_cell
    code = nbf.v4.new_code_cell
    return [
        md(
            "# Disentangled conditional VAE — interactive walkthrough\n\n"
            "TPU-framework twin of the reference's "
            "`notebooks/conditional_disentangled_vae_interactive.ipynb`: "
            "train the flagship `DisentangledConditionalVAE` on a 5-modality "
            "mix, reconstruct mixed batches, generate per-modality samples, "
            "probe disentanglement by swapping `z_modality`, and measure "
            "modality separation. Widget cell optional."
        ),
        code(SETUP),
        code(
            '''\
from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate
from medvae_tpu.data.medmnist import MedMNISTDataModule
from medvae_tpu.data.pipeline import DeviceFeeder
from medvae_tpu.models import DisentangledConditionalVAE
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step, make_forward_fn, preprocess

MODS = ["chestmnist", "octmnist", "pathmnist", "dermamnist", "pneumoniamnist"]
dm = MedMNISTDataModule(dataset_names=MODS, batch_size=64, size=28,
                        root="./data", synthetic_fallback=True,
                        augment_train=False)
dm.setup("fit")
mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])

model = DisentangledConditionalVAE(
    num_modalities=5, shared_latent_dim=8, modality_latent_dim=8,
    hidden_channels=16, ch_mult=(1, 2), num_res_blocks=1,
    attn_resolutions=(), resolution=28)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
variables = jax.jit(model.init)(rngs, jnp.zeros((2, 28, 28, 3)),
                                jnp.zeros((2,), jnp.int32))
print(f"{sum(x.size for x in jax.tree_util.tree_leaves(variables)):,} params")
'''
        ),
        code(
            '''\
tx = build_optimizer({"type": "adam", "lr": 2e-3}, None)
state = replicate(mesh, create_train_state(variables["params"], tx))
loss_cfg = {"type": "disentangled_vae", "separation_weight": 0.1,
            "contrastive_weight": 0.05}
step = build_train_step(model, loss_cfg, tx, mesh, augment=False,
                        max_channels=3, donate=False)
feeder = DeviceFeeder(dm.train_arrays, 64, mesh, shuffle=True)
losses, seps = [], []
for epoch in range(1 if QUICK else 3):
    for i, batch in enumerate(feeder.epoch(epoch)):
        if i >= EPOCH_BATCHES:
            break
        state, m = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(m["train/loss"]))
        seps.append(float(m["train/separation_loss"]))
fig, ax = plt.subplots(1, 2, figsize=(10, 3))
ax[0].plot(losses); ax[0].set_title("train/loss")
ax[1].plot(seps); ax[1].set_title("separation loss (lower = further apart)")
plt.show()
'''
        ),
        md("## Mixed-modality reconstructions"),
        code(
            '''\
forward = make_forward_fn(model)
# shuffle so one batch mixes all 5 modalities (the split concatenates
# datasets in order, so an unshuffled batch would be single-modality)
val_feeder = DeviceFeeder(dm.val_arrays, 64, mesh, shuffle=True,
                          drop_last=False)
batch = next(iter(val_feeder.epoch(0)))

@jax.jit
def recon_fn(state, batch):
    x = preprocess(batch, None, augment=False, max_channels=3)
    out = forward(state.params, x, batch, {"sample": jax.random.PRNGKey(0)},
                  deterministic=True)
    return x, out["reconstruction"], out["z"]

x, recon, z = jax.device_get(recon_fn(state, batch))
midx = jax.device_get(batch["modality_idx"])

def show(img, mod):
    # grayscale modalities live in channel 0; RGB use all three
    from medvae_tpu.data.medmnist import CHANNELS_BY_MODALITY_INDEX
    c = int(CHANNELS_BY_MODALITY_INDEX[mod])
    return img[..., 0] if c == 1 else np.clip((img + 1) / 2, 0, 1)

fig, axes = plt.subplots(2, 8, figsize=(14, 4))
for i in range(8):
    axes[0, i].imshow(show(x[i], midx[i]), cmap="gray")
    axes[0, i].set_title(f"mod {midx[i]}", fontsize=8); axes[0, i].axis("off")
    axes[1, i].imshow(show(recon[i], midx[i]), cmap="gray")
    axes[1, i].axis("off")
plt.show()
'''
        ),
        md("## Per-modality conditional samples"),
        code(
            '''\
host_params = jax.device_get(state.params)
fig, axes = plt.subplots(5, 6, figsize=(10, 9))
for mod in range(5):
    midx_s = jnp.full((6,), mod, jnp.int32)
    imgs = jax.device_get(model.apply(
        {"params": host_params}, 6, midx_s, jax.random.PRNGKey(10 + mod),
        method=model.sample_conditional))
    for j in range(6):
        axes[mod, j].imshow(show(imgs[j], mod), cmap="gray")
        axes[mod, j].axis("off")
    axes[mod, 0].set_ylabel(MODS[mod], fontsize=8)
plt.suptitle("conditional samples per modality"); plt.show()
'''
        ),
        md(
            "## Disentanglement probe: swap `z_modality`\n\n"
            "Keep `z_shared` from an image of modality A, replace the "
            "modality partition with one encoded from modality B, decode "
            "with B's head — content should persist, style should switch."
        ),
        code(
            '''\
mods_here = np.unique(midx)
ia = int(np.nonzero(midx == mods_here[0])[0][0])   # first modality present
ib = int(np.nonzero(midx == mods_here[-1])[0][0])  # a different one
mod_a, mod_b = int(midx[ia]), int(midx[ib])
za, zb = z[ia:ia + 1], z[ib:ib + 1]
sd = model.shared_latent_dim
z_swap = np.concatenate([za[..., :sd], zb[..., sd:]], axis=-1)
dec = lambda zz, mod: jax.device_get(model.apply(
    {"params": host_params}, jnp.asarray(zz),
    jnp.asarray([mod], jnp.int32), method=model.decode))
fig, axes = plt.subplots(1, 3, figsize=(8, 3))
axes[0].imshow(show(x[ia], mod_a), cmap="gray")
axes[0].set_title(f"A ({MODS[mod_a]})")
axes[1].imshow(show(x[ib], mod_b), cmap="gray")
axes[1].set_title(f"B ({MODS[mod_b]})")
axes[2].imshow(show(dec(z_swap, mod_b)[0], mod_b), cmap="gray")
axes[2].set_title("A-content + B-style")
for ax in axes: ax.axis("off")
plt.show()
'''
        ),
        md("## Modality separation statistics"),
        code(
            '''\
zf = z.reshape(len(z), -1)
zm = zf[:, -model.modality_latent_dim * model.encoder_out_res ** 2:]
cents = np.stack([zm[midx == m].mean(0) for m in range(5) if (midx == m).any()])
d = np.sqrt(((cents[:, None] - cents[None]) ** 2).sum(-1))
print("pairwise centroid distances (z_modality):")
print(np.round(d, 2))
print(f"mean off-diagonal distance: {d[np.triu_indices(len(d), 1)].mean():.2f}"
      " (memo target: > 10 after full training)")
'''
        ),
        md("## Interactive generator (optional)"),
        code(
            '''\
def gen(modality=0, seed=0, n=6):
    midx_s = jnp.full((n,), int(modality), jnp.int32)
    imgs = jax.device_get(model.apply(
        {"params": host_params}, n, midx_s, jax.random.PRNGKey(int(seed)),
        method=model.sample_conditional))
    fig, axes = plt.subplots(1, n, figsize=(2 * n, 2.2))
    for j in range(n):
        axes[j].imshow(show(imgs[j], int(modality)), cmap="gray")
        axes[j].axis("off")
    plt.suptitle(f"{MODS[int(modality)]} (seed {seed})"); plt.show()

try:
    import ipywidgets as widgets
    from IPython.display import display
    w_mod = widgets.Dropdown(options=[(n, i) for i, n in enumerate(MODS)],
                             description="modality")
    w_seed = widgets.IntSlider(min=0, max=20, description="seed")
    out = widgets.interactive_output(gen, {"modality": w_mod, "seed": w_seed})
    display(widgets.HBox([w_mod, w_seed]), out)
except Exception as e:
    print(f"(no live widget frontend: {type(e).__name__}) static generation:")
    gen(modality=2, seed=3)
'''
        ),
    ]


def build(name: str, cells) -> str:
    nb = nbf.v4.new_notebook()
    nb.cells = cells
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3"
    }
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, name)
    with open(path, "w") as f:
        nbf.write(nb, f)
    return path


def main() -> int:
    print(build("vanilla_vae_interactive.ipynb", _vanilla_cells()))
    print(build("conditional_disentangled_vae_interactive.ipynb",
                _disentangled_cells()))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
