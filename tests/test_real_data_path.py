"""Real-data readiness: the full `npz -> channel policy -> pad -> train step`
path on format-faithful MedMNIST-style fixtures (VERDICT r1 item 7).

The fixtures mimic the real archives exactly — key names, dtypes, grayscale
(N,28,28) vs RGB (N,28,28,3) image shapes, (N,1) vs (N,14)-multilabel labels
(reference loader: /root/reference/src/data/medmnist_data.py:107-125) — so
these tests prove that dropping real downloads under data/ requires zero code
changes."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

from make_npz_fixture import write_fixture  # noqa: E402

from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate, shard_batch
from medvae_tpu.data.medmnist import MedMNISTDataModule, MedMNISTSource
from medvae_tpu.data.pipeline import DeviceFeeder
from medvae_tpu.models import ConditionalVAE
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step


@pytest.fixture(scope="module")
def npz_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("medmnist_npz")
    for d in ("chestmnist", "pathmnist"):
        write_fixture(str(root), d, n=24, size=28)
    return str(root)


def test_source_loads_npz_not_synthetic(npz_root):
    src = MedMNISTSource(
        "chestmnist", split="train", size=28, root=npz_root,
        max_channels=3, synthetic_fallback=False,
    )
    assert not src.synthetic
    a = src.arrays
    assert a.images.dtype == np.uint8
    assert a.images.shape == (24, 28, 28, 3)  # gray loaded + padded to 3ch
    # channel policy: chest is grayscale -> channels 1..2 are zero padding
    assert a.images[..., 1:].max() == 0
    assert a.channels == 1
    assert a.labels.shape == (24,)  # multilabel standardized to 1-D

    rgb = MedMNISTSource(
        "pathmnist", split="train", size=28, root=npz_root,
        max_channels=3, synthetic_fallback=False,
    )
    assert not rgb.synthetic
    assert rgb.arrays.images[..., 2].max() > 0  # real RGB content


def test_missing_npz_raises_without_fallback(npz_root):
    with pytest.raises(FileNotFoundError):
        MedMNISTSource(
            "dermamnist", split="train", size=28, root=npz_root,
            max_channels=3, synthetic_fallback=False,
        )


def test_npz_to_train_step_end_to_end(npz_root):
    """Mixed gray+RGB npz datasets through the datamodule, feeder, and one
    jitted CVAE train step — the exact first-run-on-real-data path."""
    dm = MedMNISTDataModule(
        dataset_names=["chestmnist", "pathmnist"],
        batch_size=8,
        size=28,
        root=npz_root,
        synthetic_fallback=False,
        augment_train=False,
    )
    dm.setup("fit")
    assert dm.synthetic_datasets == set()  # everything came from npz

    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    model = ConditionalVAE(
        input_channels=3, latent_dim=4, hidden_channels=8, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(), dropout=0.0, resolution=28,
        condition_method="concat",
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 28, 28, 3)), jnp.zeros((2, 12)))
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    state = replicate(mesh, create_train_state(variables["params"], tx))
    step = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=3,
        donate=False,
    )

    feeder = DeviceFeeder(dm.train_arrays, 8, mesh, shuffle=True)
    losses = []
    for batch in feeder.epoch(0):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(m["train/loss"]))
    assert len(losses) == dm.train_arrays.images.shape[0] // 8
    assert all(np.isfinite(l) for l in losses)
    assert int(state.step) == len(losses)
