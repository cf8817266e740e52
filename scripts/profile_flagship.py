#!/usr/bin/env python
"""Decompose the 224² full-flagship production step (VERDICT r3 weak #3).

The plain 224² CVAE trains at 56.1 img/s (no remat; 50.1 block remat) while
the full flagship production step (`disentangled_multi_modal_cvae_full`:
disentangled CVAE + LPIPS + CLIP ViT terms) measured ~30 img/s. This script
attributes the delta with data, at the production shapes (bs 32, 224²):

  PARTS=towers   — LPIPS(AlexNet) and CLIP(ViT-B/32) loss fwd + d/d(recon),
                   fp32 (current) vs bf16 compute, and the CLIP preprocess
                   resize cost at the native-224 no-op shape.
  PARTS=attn     — the flagship's extra attention levels (the CVAE bench
                   config has attn@16 only; the flagship model has attn at
                   56² (3136 tok × 512 ch) and 28² (784 × 1024) + mid).
  PARTS=step     — full production train step variants:
                     base   — disentangled loss only (no towers)
                     towers — + LPIPS + CLIP (production loss surface)
                   STEP_VARIANTS=base,towers selects; TOWER_DTYPE=bfloat16
                   switches the frozen towers' compute dtype.

Results recorded in medvae_tpu/ops/PERF_FLAGSHIP.md.

Timing fence: jax.device_get of a value (tunneled-backend safe).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 nominal
BS = int(os.environ.get("PROFILE_BATCH", 32))
REPS = int(os.environ.get("PROFILE_REPS", 20))


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS


# --------------------------------------------------------------------------- #
# PARTS=towers: LPIPS + CLIP loss cost, fp32 vs bf16                           #
# --------------------------------------------------------------------------- #


def bench_towers() -> None:
    from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BS, 224, 224, 3), jnp.float32)
    rec = x + 0.01 * jax.random.normal(key, x.shape, jnp.float32)

    for label, dtype in (("fp32", jnp.float32), ("bf16", jnp.bfloat16)):
        lp = LPIPSLoss(dtype=dtype)
        lp_params = lp.init(jax.random.fold_in(key, 11), 224)

        @jax.jit
        def lp_fwd_bwd(p, a, b):
            return jax.value_and_grad(lambda bb: lp(p, a, bb))(b)

        t = timeit(lp_fwd_bwd, lp_params, x, rec)
        print(f"LPIPS loss f+b (d/d recon) bs{BS} 224² {label:5s}: {t*1e3:8.2f} ms")

        bc = BiomedCLIPLoss(encoder="vit", dtype=dtype)
        bc_params = bc.init(jax.random.fold_in(key, 13))

        @jax.jit
        def bc_fwd_bwd(p, a, b):
            return jax.value_and_grad(lambda bb: bc(p, a, rec=bb))(b)

        t = timeit(bc_fwd_bwd, bc_params, x, rec)
        print(f"CLIP-ViT loss f+b (d/d recon) bs{BS} 224² {label:5s}: {t*1e3:8.2f} ms")

    # the preprocess resize in isolation (224 → 224 cubic: a no-op shape the
    # old code still paid for on both branches)
    @jax.jit
    def resize_cubic(a):
        return jax.image.resize(a, a.shape, method="cubic")

    t = timeit(resize_cubic, x)
    print(f"jax.image.resize cubic 224→224 (no-op shape) bs{BS}: {t*1e3:8.2f} ms (×2 branches, f+b on one)")


# --------------------------------------------------------------------------- #
# PARTS=attn: the flagship's attention levels                                  #
# --------------------------------------------------------------------------- #


def bench_attention() -> None:
    # (tokens, channels): flagship attn levels at 224² input
    for n, c in ((3136, 512), (784, 1024)):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (BS, n, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (BS, n, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (BS, n, c), jnp.bfloat16)

        @jax.jit
        def attn_fwd_bwd(q, k, v):
            def f(q, k, v):
                logits = jnp.einsum(
                    "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
                ) * (q.shape[-1] ** -0.5)
                p = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
                return jnp.sum(jnp.einsum("bnm,bmc->bnc", p, v).astype(jnp.float32))

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        t = timeit(attn_fwd_bwd, q, k, v)
        fl = 3 * (2 * BS * n * n * c * 2)  # fwd + ~2x bwd, qk + pv
        print(
            f"attention {n} tok × {c} ch f+b bs{BS}: {t*1e3:8.2f} ms "
            f"({fl/t/1e12:6.1f} TF/s, {100*fl/t/PEAK:4.1f}% peak)"
        )


# --------------------------------------------------------------------------- #
# PARTS=flash: tiled flash kernel vs the einsum fallback at flagship shapes    #
# --------------------------------------------------------------------------- #


def bench_flash() -> None:
    from medvae_tpu.ops.attention import reference_attention
    from medvae_tpu.ops.flash_attention import flash_attention

    for n, c in ((3136, 512), (784, 1024)):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (BS, n, c), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1), (BS, n, c), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(key, 2), (BS, n, c), jnp.bfloat16)
        fl_fwd = 2 * BS * n * n * c * 2

        for label, attn in (("einsum", reference_attention), ("flash", flash_attention)):

            @jax.jit
            def fwd(q, k, v, attn=attn):
                return attn(q, k, v)

            @jax.jit
            def fwd_bwd(q, k, v, attn=attn):
                def f(q, k, v):
                    return jnp.sum(attn(q, k, v).astype(jnp.float32))

                return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

            # correctness cross-check once per shape (flash vs einsum)
            if label == "flash":
                of = jax.device_get(fwd(q, k, v)).astype(np.float32)
                orf = jax.device_get(jax.jit(reference_attention)(q, k, v)).astype(
                    np.float32
                )
                err = np.max(np.abs(of - orf))
                print(f"  flash-vs-einsum fwd max|Δ| @ {n}×{c}: {err:.3e}")

            t = timeit(fwd, q, k, v)
            print(
                f"attn {label:6s} fwd   {n} tok × {c} ch bs{BS}: {t*1e3:8.2f} ms "
                f"({fl_fwd/t/1e12:6.1f} TF/s)"
            )
            t = timeit(fwd_bwd, q, k, v)
            fl = 3 * fl_fwd  # fwd included in grad trace + ~2x bwd
            print(
                f"attn {label:6s} f+b   {n} tok × {c} ch bs{BS}: {t*1e3:8.2f} ms "
                f"({fl/t/1e12:6.1f} TF/s vs non-recompute flop count)"
            )


# --------------------------------------------------------------------------- #
# PARTS=step: full production step variants                                    #
# --------------------------------------------------------------------------- #


def _build_step(towers: bool):
    from medvae_tpu.core.mesh import create_mesh, replicate, shard_batch
    from medvae_tpu.models import DisentangledConditionalVAE
    from medvae_tpu.train.optim import build_optimizer
    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.step import build_train_step

    mesh = create_mesh()
    model = DisentangledConditionalVAE(
        num_modalities=5,
        shared_latent_dim=64,
        modality_latent_dim=64,
        hidden_channels=128,
        ch_mult=(1, 2, 4, 8),
        num_res_blocks=2,
        attn_resolutions=tuple(
            int(r)
            for r in os.environ.get("STEP_ATTN", "28,56").split(",")
            if r.strip()
        ),
        resolution=224,
        dropout=0.0,
        dtype=jnp.bfloat16,
        use_pallas=True,
        remat=(lambda r: False if r == "none" else r)(
            os.environ.get("STEP_REMAT", "block")
        ),
    )
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(
        {"params": rng, "sample": rng}, x0, jnp.zeros((2,), jnp.int32)
    )
    loss_cfg = {
        "type": "disentangled_vae", "recon_loss_type": "mse",
        "kl_weight": 1.0, "recon_weight": 1.0,
        "separation_weight": 0.1, "contrastive_weight": 0.2,
    }
    frozen = {}
    if towers:
        from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss

        tower_dtype = jnp.dtype(os.environ.get("TOWER_DTYPE", "float32"))
        loss_cfg.update(
            perceptual_weight=0.1, biomedclip_weight=0.1, clip_encoder="vit",
            tower_dtype=str(tower_dtype),
        )
        frozen["lpips"] = LPIPSLoss(dtype=tower_dtype).init(
            jax.random.fold_in(rng, 11), 224
        )
        frozen["clip"] = BiomedCLIPLoss(encoder="vit", dtype=tower_dtype).init(
            jax.random.fold_in(rng, 13)
        )
    tx = build_optimizer(
        {"type": "adamw", "lr": 1e-4}, {"type": "constant"}, gradient_clip_val=1.0
    )
    state = replicate(mesh, create_train_state(variables["params"], tx, frozen=frozen))
    step = build_train_step(
        model, loss_cfg, tx, mesh, augment=True, normalize=True, max_channels=3
    )

    rs = np.random.RandomState(0)
    midx = (np.arange(BS) % 5).astype(np.int32)
    batch = shard_batch(mesh, {
        "image_u8": rs.randint(0, 255, (BS, 224, 224, 3), np.uint8),
        "label": np.zeros((BS,), np.int32),
        "modality_onehot": np.eye(12, dtype=np.float32)[midx],
        "modality_idx": midx,
        "channels": np.asarray([1, 3, 3, 1, 3], np.int32)[midx],
        "valid": np.ones((BS,), np.float32),
    })
    return step, state, batch


def bench_step() -> None:
    variants = os.environ.get("STEP_VARIANTS", "base,towers").split(",")
    rng = jax.random.PRNGKey(0)
    for name in variants:
        towers = name.strip() == "towers"
        step, state, batch = _build_step(towers)
        t0 = time.perf_counter()
        state, m = step(state, batch, rng)
        float(jax.device_get(m["train/loss"]))
        compile_s = time.perf_counter() - t0

        steps = 0
        t0 = time.perf_counter()
        while True:
            state, m = step(state, batch, rng)
            steps += 1
            if steps % 5 == 0:
                float(jax.device_get(m["train/loss"]))
                if time.perf_counter() - t0 > float(os.environ.get("BENCH_SECONDS", 15.0)):
                    break
        float(jax.device_get(m["train/loss"]))
        el = time.perf_counter() - t0
        extra = f" TOWER_DTYPE={os.environ.get('TOWER_DTYPE', 'float32')}" if towers else ""
        print(
            f"flagship step [{name}{extra}] remat={os.environ.get('STEP_REMAT', 'block')} "
            f"bs{BS}: {steps*BS/el:6.1f} img/s ({el/steps*1e3:7.1f} ms/step, "
            f"compile+warm {compile_s:.0f}s)"
        )


def main() -> int:
    parts = os.environ.get("PARTS", "towers,attn").split(",")
    print(f"BS={BS}, reps={REPS}, device={jax.devices()[0].device_kind}")
    if "towers" in parts:
        bench_towers()
    if "attn" in parts:
        bench_attention()
    if "flash" in parts:
        bench_flash()
    if "step" in parts:
        bench_step()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
