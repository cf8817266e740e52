"""Determinism: same seed → bit-identical training trajectory; different
seed → different. (The reference sets cudnn.deterministic,
training_utils.py:147-154; JAX is deterministic by construction but the RNG
plumbing — fold_in of step/stream/axis — must actually be wired through.)"""

import numpy as np
import jax
import jax.numpy as jnp

from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate, shard_batch
from medvae_tpu.models import BaseVAE
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step
import pytest

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow


TINY = dict(latent_dim=8, hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(), dropout=0.1, resolution=8)


def _losses(seed: int, steps: int = 4):
    model = BaseVAE(input_channels=1, **TINY)
    rng = jax.random.PRNGKey(seed)
    rngs = {"params": rng, "sample": rng, "dropout": rng}
    variables = model.init(rngs, jnp.zeros((2, 8, 8, 1)))
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    state = replicate(mesh, create_train_state(variables["params"], tx))
    step = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=True, max_channels=1,
        donate=False,
    )
    rs = np.random.RandomState(0)
    batch = shard_batch(mesh, {
        "image_u8": rs.randint(0, 255, (8, 8, 8, 1), np.uint8),
        "label": np.zeros(8, np.int32),
        "modality_onehot": np.zeros((8, 12), np.float32),
        "modality_idx": np.zeros(8, np.int32),
        "channels": np.ones(8, np.int32),
        "valid": np.ones(8, np.float32),
    })
    out = []
    for _ in range(steps):
        state, m = step(state, batch, jax.random.fold_in(rng, 99))
        out.append(float(m["train/loss"]))
    return out


def test_same_seed_is_bit_identical():
    assert _losses(0) == _losses(0)


def test_different_seed_differs():
    assert _losses(0) != _losses(1)


def test_per_step_rng_varies():
    """Two consecutive steps on the same batch must draw different sampling
    noise (step folded into the stream) — losses can't be identical."""
    losses = _losses(0, steps=3)
    assert len(set(losses)) > 1
