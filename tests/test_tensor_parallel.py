"""Tensor parallelism over the `model` mesh axis: a (data=4, model=2) mesh
must train numerically identically to pure DP — XLA's SPMD partitioner
handles the channel-shard collectives from the NamedShardings alone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medvae_tpu.core.mesh import MODEL_AXIS, MeshSpec, create_mesh, replicate, shard_batch
from medvae_tpu.models import BaseVAE
from medvae_tpu.parallel import shard_state, state_shardings
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow


TINY = dict(latent_dim=8, hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(), dropout=0.0, resolution=8)


def _batch(n):
    rs = np.random.RandomState(0)
    return {
        "image_u8": rs.randint(0, 255, (n, 8, 8, 1), np.uint8),
        "label": np.zeros(n, np.int32),
        "modality_onehot": np.zeros((n, 12), np.float32),
        "modality_idx": np.zeros(n, np.int32),
        "channels": np.ones(n, np.int32),
        "valid": np.ones(n, np.float32),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_tp_mesh_matches_pure_dp():
    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 8, 8, 1)))
    state0 = create_train_state(variables["params"], tx)
    batch_host = _batch(8)
    rng = jax.random.PRNGKey(7)

    # pure DP over 8 devices
    mesh_dp = create_mesh(MeshSpec(data=8, model=1), jax.devices()[:8])
    step_dp = build_train_step(
        model, {"type": "vae"}, tx, mesh_dp, augment=False, max_channels=1,
        donate=False,
    )
    s_dp, m_dp = step_dp(
        replicate(mesh_dp, state0), shard_batch(mesh_dp, batch_host), rng
    )

    # 4-way DP × 2-way TP
    mesh_tp = create_mesh(MeshSpec(data=4, model=2), jax.devices()[:8])
    sharded_state = shard_state(state0, mesh_tp)
    # conv kernels must actually be sharded over the model axis
    k = sharded_state.params["encoder"]["conv_in"]["kernel"]
    assert MODEL_AXIS in str(k.sharding.spec)
    step_tp = build_train_step(
        model, {"type": "vae"}, tx, mesh_tp, augment=False, max_channels=1,
        donate=False, state_sharding=state_shardings(state0, mesh_tp),
    )
    s_tp, m_tp = step_tp(sharded_state, shard_batch(mesh_tp, batch_host), rng)

    assert abs(float(m_dp["train/loss"]) - float(m_tp["train/loss"])) < 1e-4
    a = np.asarray(jax.device_get(s_dp.params["encoder"]["conv_in"]["kernel"]))
    b = np.asarray(jax.device_get(s_tp.params["encoder"]["conv_in"]["kernel"]))
    np.testing.assert_allclose(a, b, atol=2e-5)
