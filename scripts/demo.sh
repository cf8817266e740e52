#!/usr/bin/env bash
# Smoke demo: tiny model forward check + a 5-epoch quick training run.
# Parity with the reference scripts/demo.sh (inline model test + quick train).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== model forward smoke ==="
python - <<'PY'
import jax, jax.numpy as jnp
from medvae_tpu.models import BaseVAE
model = BaseVAE(input_channels=1, latent_dim=16, hidden_channels=32,
                ch_mult=(1, 2, 4), num_res_blocks=1, attn_resolutions=(),
                resolution=28)
rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
x = jnp.zeros((4, 28, 28, 1))
variables = jax.jit(model.init)(rngs, x)
out = model.apply(variables, x, rngs={"sample": jax.random.PRNGKey(2)})
assert out["reconstruction"].shape == x.shape
print("forward ok:", {k: tuple(v.shape) for k, v in out.items()})
PY

echo "=== 5-epoch quick training ==="
python -m medvae_tpu.cli.train experiment=chest_base_vae_quick \
    training.max_epochs=5 "$@"
