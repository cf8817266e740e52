"""Benchmark: CVAE training throughput (images/sec/chip) on the live device.

North star (BASELINE.json): >=10,000 images/sec/chip conditional-VAE training
at 28x28 on TPU v5e.

Modes (BENCH_MODE):
  * step (default) — the jitted train step on a device-resident synthetic
    batch: isolates device throughput (no host feed in the timed loop).
    Reports MFU (achieved model TFLOP/s vs chip bf16 peak) from XLA's
    compiled-cost analysis.
  * pipeline — the PRODUCTION path: a full epoch loop feeding the same step.
    Default = what the trainer does under data.device_cache=auto: the split
    pinned on device once, per-step batch assembly (shuffle/gather/one-hot)
    on device (DeviceCachedFeeder — zero steady-state host transfers).
    BENCH_CACHE=0 forces the host-streamed DeviceFeeder (per-step host
    shuffle+gather+device_put, prefetch 2) instead — the multi-host path.
    Reports end-to-end images/sec plus the host-feed duty cycle.
  * generate — conditional sampling throughput (samples/sec).

Configs (BENCH_CONFIG): quick (default; 28x28, the north-star config) or
full224 (224x224 CVAE, ch_mult 1-2-4-8 + attention @16 — the config that
actually stresses the MXU/HBM; reference configs/model/base_vae.yaml).
BENCH_MODEL=flagship swaps the ConditionalVAE for the flagship
DisentangledConditionalVAE step (routing + separation/contrastive losses);
combined with BENCH_CONFIG=full224 it benches the PRODUCTION surface of
configs/experiment/disentangled_multi_modal_cvae_full.yaml — attention at
{28², 56²} plus frozen LPIPS + CLIP-ViT fp32 towers (BENCH_TOWERS=0 drops
the towers), adamw, augment — the committed BENCH_FLAGSHIP_r05.json row.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Timing fences use jax.device_get of a VALUE — through tunneled backends
block_until_ready can acknowledge before execution completes.
"""

from __future__ import annotations

import json
import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _wait_for_backend() -> None:
    """Block (bounded) until the remote device service accepts connections.

    Under a tunneled backend (JAX_PLATFORMS=axon) jax device initialization
    HANGS rather than erroring when the tunnel is down, so the retry loop in
    _main_with_retry never gets a chance. Polling the service port first turns
    an indefinite hang into either a clean start or a loud bounded failure.
    BENCH_WAIT_BACKEND=0 disables; BENCH_BACKEND_PORT overrides the port.
    """
    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return
    port = int(os.environ.get("BENCH_BACKEND_PORT", 8113))
    budget = float(os.environ.get("BENCH_WAIT_BACKEND", 1800.0))
    if budget <= 0:
        return
    deadline = time.monotonic() + budget
    notified = False
    while True:
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=5):
                return
        except OSError:
            pass
        if time.monotonic() >= deadline:
            print(
                f"bench: device service 127.0.0.1:{port} unreachable for "
                f"{budget:.0f}s; giving up",
                file=sys.stderr,
            )
            raise SystemExit(3)
        if not notified:
            print(
                f"bench: device service 127.0.0.1:{port} down; waiting "
                f"(up to {budget:.0f}s)",
                file=sys.stderr,
            )
            notified = True
        time.sleep(15)


_wait_for_backend()

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMAGES_PER_SEC = 10_000.0  # BASELINE.json north-star target
# bf16 peak per chip; v5e = 197 TFLOP/s. Override for other chips.
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def _config():
    """(model_kwargs, resolution, default_batch) for BENCH_CONFIG."""
    cfg = os.environ.get("BENCH_CONFIG", "quick")
    if cfg == "full224":
        # bs 32 fits HBM without remat; measured 56.1 img/s vs 50.1 with
        # block remat (the ~12% is the remat recompute). BENCH_REMAT=block
        # restores checkpointing for larger-batch experiments.
        return (
            dict(
                latent_dim=128,
                hidden_channels=128,
                ch_mult=(1, 2, 4, 8),
                num_res_blocks=2,
                attn_resolutions=(16,),
                resolution=224,
                remat=os.environ.get("BENCH_REMAT", "") or False,
            ),
            224,
            32,
        )
    return (
        dict(
            latent_dim=16,
            hidden_channels=32,
            ch_mult=(1, 2, 4),
            num_res_blocks=1,
            attn_resolutions=(),
            resolution=28,
        ),
        28,
        4096,
    )


def _synthetic_batch(batch_size: int, size: int) -> dict:
    rs = np.random.RandomState(0)
    midx = (np.arange(batch_size) % 5).astype(np.int32)
    return {
        "image_u8": rs.randint(0, 255, (batch_size, size, size, 3), np.uint8),
        "label": np.zeros((batch_size,), np.int32),
        "modality_onehot": np.eye(12, dtype=np.float32)[midx],
        "modality_idx": midx,
        "channels": np.asarray([1, 3, 3, 1, 3], np.int32)[midx],
        "valid": np.ones((batch_size,), np.float32),
    }


def _build(mesh):
    """Model + jitted train step + initial state.

    BENCH_MODEL=cvae (default) is the production ConditionalVAE path — the
    north-star metric. BENCH_MODEL=flagship benches the
    DisentangledConditionalVAE training step instead (one-hot-routed
    projectors/heads + batch-global separation and InfoNCE losses), the
    heaviest per-step graph of the model zoo.
    """
    from medvae_tpu.core.mesh import replicate
    from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
    from medvae_tpu.train.optim import build_optimizer
    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.step import build_train_step

    model_kwargs, size, _ = _config()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, size, size, 3), jnp.bfloat16)
    flagship = os.environ.get("BENCH_MODEL", "cvae") == "flagship"
    full224 = os.environ.get("BENCH_CONFIG", "quick") == "full224"
    frozen = {}
    if flagship:
        latent = model_kwargs.pop("latent_dim")
        if full224:
            # the PRODUCTION flagship surface (configs/experiment/
            # disentangled_multi_modal_cvae_full.yaml): attention at 28² and
            # 56² (not the CVAE bench's attn@16) — matches
            # ops/PERF_FLAGSHIP.md's step decomposition.
            model_kwargs["attn_resolutions"] = (28, 56)
        model = DisentangledConditionalVAE(
            num_modalities=5,
            shared_latent_dim=latent // 2,
            modality_latent_dim=latent // 2,
            dropout=0.0,
            dtype=jnp.bfloat16,
            use_pallas=True,
            **model_kwargs,
        )
        cond0 = jnp.zeros((2,), jnp.int32)
        loss_cfg = {
            "type": "disentangled_vae", "recon_loss_type": "mse",
            "kl_weight": 1.0, "recon_weight": 1.0,
            "separation_weight": 0.1, "contrastive_weight": 0.2,
        }
        # BENCH_TOWERS=1 (default for full224) adds the frozen LPIPS +
        # CLIP-ViT feature terms — the full production loss surface.
        if os.environ.get("BENCH_TOWERS", "1" if full224 else "0") == "1":
            from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss

            loss_cfg.update(
                perceptual_weight=0.1, biomedclip_weight=0.1,
                clip_encoder="vit", tower_dtype="float32",
            )
            frozen["lpips"] = LPIPSLoss(dtype=jnp.float32).init(
                jax.random.fold_in(rng, 11), size
            )
            frozen["clip"] = BiomedCLIPLoss(encoder="vit", dtype=jnp.float32).init(
                jax.random.fold_in(rng, 13)
            )
    else:
        model = ConditionalVAE(
            input_channels=3,
            condition_method="concat",
            dropout=0.0,
            dtype=jnp.bfloat16,
            use_pallas=True,
            **model_kwargs,
        )
        cond0 = jnp.zeros((2, 12), jnp.bfloat16)
        loss_cfg = {"type": "vae", "recon_loss_type": "mse",
                    "kl_weight": 1.0, "recon_weight": 1.0}
    variables = jax.jit(model.init)({"params": rng, "sample": rng}, x0, cond0)
    if flagship and full224:
        # production optimizer (experiment yaml: adamw lr 1e-4)
        tx = build_optimizer(
            {"type": "adamw", "lr": 1e-4}, {"type": "constant"},
            gradient_clip_val=1.0,
        )
    else:
        tx = build_optimizer(
            {"type": "adam", "lr": 1e-3}, {"type": "constant"},
            gradient_clip_val=1.0,
        )
    state = replicate(
        mesh, create_train_state(variables["params"], tx, frozen=frozen)
    )
    step = build_train_step(
        model, loss_cfg, tx, mesh,
        augment=flagship and full224, normalize=True, max_channels=3,
    )
    return model, step, state, size


def _cost_analysis_flops(step, state, batch, rng):
    """FLOPs/step from XLA's compiled cost analysis (None if unavailable)."""
    try:
        compiled = step.lower(state, batch, rng).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _mfu_extras(flops_per_step, steps, elapsed, n_chips):
    """NB: flops come from the compiled HLO, so configs with remat count the
    rematerialized recompute — this is hardware utilization (what fraction of
    peak the MXU sustained), slightly above model-FLOPs utilization."""
    if not flops_per_step:
        return {}
    achieved = flops_per_step * steps / elapsed / n_chips
    return {
        "flops_per_step": round(flops_per_step, 0),
        "achieved_tflops_per_chip": round(achieved / 1e12, 2),
        "mfu": round(achieved / (PEAK_TFLOPS * 1e12), 4),
    }


def generation_bench() -> None:
    """BENCH_MODE=generate: conditional sampling throughput (samples/sec)."""
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


def pipeline_bench() -> None:
    """BENCH_MODE=pipeline: end-to-end DeviceFeeder -> train step (the path a
    real training run takes every step: host shuffle + fancy-index gather +
    device_put, prefetch-overlapped with device compute)."""
    from medvae_tpu.core.mesh import create_mesh
    from medvae_tpu.data.medmnist import SplitArrays
    from medvae_tpu.data.pipeline import DeviceCachedFeeder, DeviceFeeder

    mesh = create_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))
    _, size, default_bs = _config()
    batch_size = int(os.environ.get("BENCH_BATCH", default_bs)) * n_chips
    model, step, state, size = _build(mesh)

    # synthetic dataset: enough for ~8 steps/epoch so shuffles are realistic
    steps_per_epoch = int(os.environ.get("BENCH_EPOCH_STEPS", 8))
    n = batch_size * steps_per_epoch
    proto = _synthetic_batch(n, size)
    arrays = SplitArrays(
        images=proto["image_u8"],
        labels=proto["label"],
        modality_idx=proto["modality_idx"],
        channels=3,
    )
    feeder_cls = (
        DeviceFeeder
        if os.environ.get("BENCH_CACHE", "1") == "0"
        else DeviceCachedFeeder
    )
    feeder = feeder_cls(
        arrays, batch_size, mesh, shuffle=True, drop_last=True, prefetch=2
    )

    rng = jax.random.PRNGKey(0)
    # warmup epoch: compile + caches
    for batch in feeder.epoch(0):
        state, m = step(state, batch, rng)
    float(jax.device_get(m["train/loss"]))

    flops_per_step = _cost_analysis_flops(step, state, batch, rng)

    target_seconds = float(os.environ.get("BENCH_SECONDS", 12.0))
    steps = 0
    host_feed_time = 0.0
    t0 = time.perf_counter()
    epoch = 1
    while True:
        it = feeder.epoch(epoch)
        while True:
            th = time.perf_counter()
            try:
                batch = next(it)  # host gather + device_put dispatch
            except StopIteration:
                break
            host_feed_time += time.perf_counter() - th
            state, m = step(state, batch, rng)
            steps += 1
        float(jax.device_get(m["train/loss"]))  # epoch fence
        epoch += 1
        if time.perf_counter() - t0 > target_seconds:
            break
    last_loss = float(jax.device_get(m["train/loss"]))
    elapsed = time.perf_counter() - t0
    assert last_loss == last_loss, "NaN loss in benchmark"

    per_chip = steps * batch_size / elapsed / n_chips
    prefix = (
        "flagship" if os.environ.get("BENCH_MODEL", "cvae") == "flagship"
        else "cvae"
    )
    out = {
        "metric": f"{prefix}_train_pipeline_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC, 4),
        "host_feed_duty_cycle": round(host_feed_time / elapsed, 4),
    }
    out.update(_mfu_extras(flops_per_step, steps, elapsed, n_chips))
    print(json.dumps(out))


def step_bench() -> None:
    """Default: device-step throughput on a resident batch (no host feed)."""
    from medvae_tpu.core.mesh import create_mesh, shard_batch

    mesh = create_mesh()
    n_chips = int(np.prod(list(mesh.shape.values())))
    _, size, default_bs = _config()
    batch_size = int(os.environ.get("BENCH_BATCH", default_bs)) * n_chips
    model, step, state, size = _build(mesh)
    batch = shard_batch(mesh, _synthetic_batch(batch_size, size))

    rng = jax.random.PRNGKey(0)
    state, m = step(state, batch, rng)  # warmup / compile
    float(jax.device_get(m["train/loss"]))

    flops_per_step = _cost_analysis_flops(step, state, batch, rng)

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

    per_chip = steps * batch_size / elapsed / n_chips
    prefix = (
        "flagship" if os.environ.get("BENCH_MODEL", "cvae") == "flagship"
        else "cvae"
    )
    out = {
        "metric": f"{prefix}_train_images_per_sec_per_chip",
        "value": round(per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(per_chip / BASELINE_IMAGES_PER_SEC, 4),
    }
    out.update(_mfu_extras(flops_per_step, steps, elapsed, n_chips))
    print(json.dumps(out))


def main() -> None:
    mode = os.environ.get("BENCH_MODE", "step")
    if mode == "generate":
        generation_bench()
    elif mode == "pipeline":
        pipeline_bench()
    else:
        step_bench()


def _main_with_retry() -> None:
    """Retry transient backend failures (tunneled TPU worker restarts /
    transport resets surface as UNAVAILABLE JaxRuntimeErrors). A bench run
    is stateless, so a clean re-run after a pause is always valid; bounded
    so a genuinely dead backend still fails loudly. BENCH_RETRIES=0 disables."""
    tries = max(0, int(os.environ.get("BENCH_RETRIES", 2)))
    for attempt in range(tries + 1):
        try:
            main()
            return
        except jax.errors.JaxRuntimeError as e:
            transient = "UNAVAILABLE" in str(e) or "Connection" in str(e)
            if not transient or attempt == tries:
                raise
            wait = 60.0 * (attempt + 1)
            print(
                f"bench: transient backend error ({str(e).splitlines()[0][:120]}); "
                f"retry {attempt + 1}/{tries} in {wait:.0f}s",
                file=sys.stderr,
            )
            time.sleep(wait)


if __name__ == "__main__":
    _main_with_retry()
