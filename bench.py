"""Benchmark: CVAE training throughput (images/sec/chip) on the live device.

North star (BASELINE.json): ≥10,000 images/sec/chip conditional-VAE training at
28×28 on TPU v5e. This runs the real jitted train step (ConditionalVAE quick
architecture, concat conditioning, MSE+KL loss, Adam) on synthetic multi-modal
batches resident in host memory, exactly the production path: uint8 host feed,
on-device normalization, data-sharded batch over the mesh.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

# default to the real backend; tests force cpu in their own env
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC = 10_000.0  # BASELINE.json north-star target


def generation_bench() -> None:
    """BENCH_MODE=generate: conditional sampling throughput (samples/sec)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medvae_tpu.models import DisentangledConditionalVAE

    model = DisentangledConditionalVAE(
        num_modalities=5, shared_latent_dim=8, modality_latent_dim=8,
        hidden_channels=32, ch_mult=(1, 2, 4), num_res_blocks=1,
        attn_resolutions=(), resolution=28, dtype=jnp.bfloat16, use_pallas=True,
    )
    rng = jax.random.PRNGKey(0)
    n = int(os.environ.get("BENCH_BATCH", 4096))
    midx = jnp.asarray(np.arange(n) % 5, jnp.int32)
    variables = jax.jit(model.init)(
        {"params": rng, "sample": rng}, jnp.zeros((2, 28, 28, 3), jnp.bfloat16),
        jnp.zeros((2,), jnp.int32),
    )

    sample = jax.jit(
        lambda v, m, k: model.apply(v, n, m, k, method=model.sample_conditional)
    )
    out = sample(variables, midx, rng)
    float(jax.device_get(out[0, 0, 0, 0]))
    steps = 0
    t0 = time.perf_counter()
    while True:
        out = sample(variables, midx, jax.random.fold_in(rng, steps))
        steps += 1
        if steps % 10 == 0:
            float(jax.device_get(out[0, 0, 0, 0]))
            if time.perf_counter() - t0 > float(os.environ.get("BENCH_SECONDS", 8.0)):
                break
    float(jax.device_get(out[0, 0, 0, 0]))
    rate = steps * n / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "metric": "cvae_generation_samples_per_sec_per_chip",
                "value": round(rate, 1),
                "unit": "samples/sec/chip",
                "vs_baseline": round(rate / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


def main() -> None:
    if os.environ.get("BENCH_MODE") == "generate":
        generation_bench()
        return
    from medvae_tpu.core.mesh import create_mesh, replicate, shard_batch
    from medvae_tpu.models import ConditionalVAE
    from medvae_tpu.train.optim import build_optimizer
    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.step import build_train_step

    mesh = create_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))

    batch_size = int(os.environ.get("BENCH_BATCH", 4096)) * n_chips
    model = ConditionalVAE(
        input_channels=3,
        latent_dim=16,
        hidden_channels=32,
        ch_mult=(1, 2, 4),
        num_res_blocks=1,
        attn_resolutions=(),
        dropout=0.0,
        resolution=28,
        condition_method="concat",
        dtype=jnp.bfloat16,
        use_pallas=True,
    )

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 28, 28, 3), jnp.bfloat16)
    cond0 = jnp.zeros((2, 12), jnp.bfloat16)
    variables = model.init({"params": rng, "sample": rng}, x0, cond0)

    tx = build_optimizer(
        {"type": "adam", "lr": 1e-3}, {"type": "constant"}, gradient_clip_val=1.0
    )
    state = replicate(mesh, create_train_state(variables["params"], tx))

    loss_cfg = {"type": "vae", "recon_loss_type": "mse",
                "kl_weight": 1.0, "recon_weight": 1.0}
    step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, normalize=True, max_channels=3
    )

    # synthetic multi-modal batch (structured, not noise)
    rs = np.random.RandomState(0)
    midx = (np.arange(batch_size) % 5).astype(np.int32)
    batch_host = {
        "image_u8": rs.randint(0, 255, (batch_size, 28, 28, 3), np.uint8),
        "label": np.zeros((batch_size,), np.int32),
        "modality_onehot": np.eye(12, dtype=np.float32)[midx],
        "modality_idx": midx,
        "channels": np.asarray([1, 3, 3, 1, 3], np.int32)[midx],
        "valid": np.ones((batch_size,), np.float32),
    }
    batch = shard_batch(mesh, batch_host)

    # warmup / compile. NB: through tunneled backends block_until_ready can be
    # a no-op acknowledgment — fetching the VALUE is the only reliable fence,
    # so all timing fences below use device_get.
    state, m = step(state, batch, rng)
    float(jax.device_get(m["train/loss"]))

    # timed window
    target_seconds = float(os.environ.get("BENCH_SECONDS", 8.0))
    steps = 0
    t0 = time.perf_counter()
    while True:
        state, m = step(state, batch, rng)
        steps += 1
        if steps % 10 == 0:
            float(jax.device_get(m["train/loss"]))
            if time.perf_counter() - t0 > target_seconds:
                break
    last_loss = float(jax.device_get(m["train/loss"]))
    elapsed = time.perf_counter() - t0
    assert last_loss == last_loss, "NaN loss in benchmark"

    images_per_sec = steps * batch_size / elapsed
    per_chip = images_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "cvae_train_images_per_sec_per_chip",
                "value": round(per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
