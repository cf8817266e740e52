"""Jitted train / eval steps.

Replaces the Lightning training_step / validation_step / manual dual-optimizer
GAN loop (reference src/lightning_module.py:98-312) with pure, jitted functions
over a device mesh:

  * one `jax.jit` with NamedShardings — batch sharded over the `data` mesh axis,
    params replicated; XLA inserts the gradient all-reduce over ICI (the NCCL
    analogue, SURVEY §2.3). The explicit `shard_map` variant lives in
    medvae_tpu/parallel/shard_map_step.py and is numerically identical.
  * batch preprocessing (uint8 → [−1,1], channel masking, augmentation) is fused
    into the step — the host ships uint8 only.
  * loss dispatch by loss_config.type happens at build time (static), mirroring
    the reference dispatch (lightning_module.py:46-86).
  * the GAN path performs the generator update and the discriminator update in
    one step function (dual optimizer states, step-gated discriminator start,
    adaptive adversarial weight via two nested jax.grads w.r.t. the decoder's
    conv_out kernel — reference vae_losses.py:370-382).

Reference quirks intentionally not replicated (documented in SURVEY §7):
  * `posteriors.kl()` in the reference GAN path would raise on
    torch.distributions.Normal; we compute the intended sum-KL/bsz.
  * BetaVAE's β is never applied by the reference trainer (compute_loss is
    dead code); pass loss.use_model_beta=true to actually apply it here.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medvae_tpu.core.mesh import DATA_AXIS
from medvae_tpu.data.pipeline import normalize_and_augment
from medvae_tpu.losses.elbo import DisentangledVAELoss, VAELoss, gaussian_kl
from medvae_tpu.losses.gan import (
    LPIPSWithDiscriminator,
    adaptive_weight,
    discriminator_input,
)
from medvae_tpu.losses.perceptual import BiomedCLIPLoss, LPIPSLoss
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
from medvae_tpu.train.metrics import kl_metrics, latent_metrics, reconstruction_metrics
from medvae_tpu.train.state import TrainState


# --------------------------------------------------------------------------- #
# model forward dispatch (reference lightning_module.py:113-128)               #
# --------------------------------------------------------------------------- #


def make_forward_fn(model) -> Callable:
    """Returns forward(params, x, batch, rngs, deterministic) -> outputs dict.

    An optional `batch["noise"]` (per-sample reparameterization eps, shape
    (B, enc_res, enc_res, latent)) overrides the in-graph rng draw. Because it
    rides the batch it shards with it, which makes jit / shard_map /
    grad-accum formulations use identical per-sample noise — the basis of the
    numerical-equivalence tests (tests/test_step_equivalence.py)."""
    if isinstance(model, DisentangledConditionalVAE):

        def forward(params, x, batch, rngs, deterministic=True):
            return model.apply(
                {"params": params},
                x,
                batch["modality_idx"],
                deterministic=deterministic,
                rngs=rngs,
                noise=batch.get("noise"),
            )

    elif isinstance(model, ConditionalVAE):

        def forward(params, x, batch, rngs, deterministic=True):
            return model.apply(
                {"params": params},
                x,
                batch["modality_onehot"],
                deterministic=deterministic,
                rngs=rngs,
                noise=batch.get("noise"),
            )

    else:

        def forward(params, x, batch, rngs, deterministic=True):
            return model.apply(
                {"params": params},
                x,
                deterministic=deterministic,
                rngs=rngs,
                noise=batch.get("noise"),
            )

    return forward


def make_decode_fn(model) -> Callable:
    """decode(params, z, batch) -> reconstruction (modality-routed when the
    model requires it)."""
    if isinstance(model, DisentangledConditionalVAE):

        def decode(params, z, batch):
            return model.apply(
                {"params": params}, z, batch["modality_idx"], method=model.decode
            )

    else:

        def decode(params, z, batch):
            return model.apply({"params": params}, z, method=model.decode)

    return decode


def preprocess(
    batch: Dict[str, jax.Array],
    rng: Optional[jax.Array],
    *,
    augment: bool,
    normalize: bool = True,
    max_channels: int,
    dtype=jnp.float32,
) -> jax.Array:
    """uint8 → normalized float, padded channels re-zeroed (the reference pads
    *after* per-modality normalization, medmnist_data.py:50-72, so padding must
    stay exactly 0, not −1)."""
    x = normalize_and_augment(
        batch["image_u8"], rng, normalize=normalize, augment=augment, dtype=dtype
    )
    if "channels" in batch and max_channels > 1:
        mask = (
            jnp.arange(max_channels)[None, :] < batch["channels"][:, None]
        ).astype(x.dtype)
        x = x * mask[:, None, None, :]
    return x


# --------------------------------------------------------------------------- #
# criterion dispatch (reference lightning_module.py:46-86)                     #
# --------------------------------------------------------------------------- #


def _tower_dtype(loss_cfg: Dict[str, Any]) -> str:
    """Compute dtype for the frozen feature towers (LPIPS / CLIP).

    Defaults to fp32: measured on v5e at the production shapes
    (ops/PERF_FLAGSHIP.md), the fp32 towers cost ~50 ms of a ~1 s step —
    and the bf16 CLIP ViT is pathologically SLOWER (XLA lays out the
    50-token × 64-dim-head attention into padded 16-row bf16 tiles), so
    bf16 buys nothing here. `loss.tower_dtype: bfloat16` remains available;
    all reductions (LPIPS channel normalize + lin heads, CLIP LayerNorms/
    attention logits/feature distance) stay fp32 either way.
    """
    return str(loss_cfg.get("tower_dtype", "float32") or "float32")


def make_criterion(loss_cfg: Dict[str, Any], model) -> Callable:
    """Returns criterion(frozen, outputs, targets) -> loss dict (fp32 scalars)."""
    loss_type = str(loss_cfg.get("type", "vae"))

    if loss_type == "vae":
        beta = 1.0
        if loss_cfg.get("use_model_beta") and hasattr(model, "beta"):
            beta = float(model.beta)
        crit = VAELoss(
            recon_loss_type=loss_cfg.get("recon_loss_type", "mse"),
            kl_weight=float(loss_cfg.get("kl_weight", 1.0)),
            recon_weight=float(loss_cfg.get("recon_weight", 1.0)),
            beta=beta,
        )
        return lambda frozen, outputs, targets: crit(outputs, targets)

    if loss_type == "disentangled_vae":
        crit = DisentangledVAELoss(
            recon_loss_type=loss_cfg.get("recon_loss_type", "mse"),
            kl_weight=float(loss_cfg.get("kl_weight", 1.0)),
            recon_weight=float(loss_cfg.get("recon_weight", 1.0)),
            separation_weight=float(loss_cfg.get("separation_weight", 0.1)),
            contrastive_weight=float(loss_cfg.get("contrastive_weight", 0.05)),
        )
        # optional perceptual terms for the full flagship config (BASELINE
        # configs item 4: "Disentangled multi-modal CVAE with LPIPS +
        # BiomedCLIP feature-matching losses"); weights default 0 = off.
        # Frozen nets are initialized by the Trainer into state.frozen.
        p_w = float(loss_cfg.get("perceptual_weight", 0.0) or 0.0)
        bc_w = float(loss_cfg.get("biomedclip_weight", 0.0) or 0.0)
        if p_w or bc_w:
            td = _tower_dtype(loss_cfg)
            lp = LPIPSLoss(dtype=td) if p_w else None
            bc = (
                BiomedCLIPLoss(
                    compute_rec_loss=True,
                    compute_lat_loss=False,
                    encoder=loss_cfg.get("clip_encoder", "simple"),
                    dtype=td,
                )
                if bc_w
                else None
            )

            def criterion(frozen, outputs, targets):
                d = crit(outputs, targets)
                total = d["loss"]
                if lp is not None:
                    pl = jnp.nan_to_num(
                        lp(frozen["lpips"], targets, outputs["reconstruction"])
                    )
                    d["p_loss"] = pl
                    total = total + p_w * pl
                if bc is not None:
                    bl = jnp.nan_to_num(
                        bc(frozen["clip"], targets,
                           rec=outputs["reconstruction"])
                    )
                    d["bc_loss"] = bl
                    total = total + bc_w * bl
                d["loss"] = total
                return d

            return criterion
        return lambda frozen, outputs, targets: crit(outputs, targets)

    if loss_type == "lpips":
        lp = LPIPSLoss(dtype=_tower_dtype(loss_cfg))

        def criterion(frozen, outputs, targets):
            loss = lp(frozen["lpips"], targets, outputs["reconstruction"])
            return {"loss": loss, "p_loss": loss}

        return criterion

    if loss_type == "biomedclip":
        bc = BiomedCLIPLoss(
            compute_rec_loss=True,
            compute_lat_loss=False,
            encoder=loss_cfg.get("clip_encoder", "simple"),
            dtype=_tower_dtype(loss_cfg),
        )

        def criterion(frozen, outputs, targets):
            loss = bc(frozen["clip"], targets, rec=outputs["reconstruction"])
            return {"loss": loss, "bc_loss": loss}

        return criterion

    raise ValueError(f"Unknown loss type: {loss_type}")


def make_gan_loss(loss_cfg: Dict[str, Any]) -> LPIPSWithDiscriminator:
    return LPIPSWithDiscriminator(
        discriminator_factor=float(loss_cfg.get("discriminator_factor", 1.0)),
        perceptual_factor=float(loss_cfg.get("perceptual_factor", 1.0)),
        pixel_factor=float(loss_cfg.get("pixel_factor", 0.0)),
        kl_factor=float(loss_cfg.get("kl_factor", 1.0)),
        discriminator_iter_start=int(loss_cfg.get("discriminator_iter_start", 50001)),
        use_biomedclip_loss=bool(loss_cfg.get("use_biomedclip_loss", False)),
        biomedclip_factor=float(loss_cfg.get("biomedclip_factor", 1.0)),
        clip_encoder=str(loss_cfg.get("clip_encoder", "simple")),
        weights_path=loss_cfg.get("weights_path") or None,
        clip_weights_path=loss_cfg.get("clip_weights_path") or None,
        tower_dtype=_tower_dtype(loss_cfg),
    )


# --------------------------------------------------------------------------- #
# step builders                                                                #
# --------------------------------------------------------------------------- #


def _shardings(mesh: Mesh):
    from medvae_tpu.core.mesh import batch_axes

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(batch_axes(mesh)))
    return repl, data


def _batch_sharding(mesh: Mesh, batch_spec: Dict[str, int]):
    from medvae_tpu.core.mesh import batch_axes

    data = {
        k: NamedSharding(mesh, P(batch_axes(mesh), *([None] * (nd - 1))))
        for k, nd in batch_spec.items()
    }
    return data



def make_gan_grads_fn(model, disc, gan_loss, kernel_grad_sync=None):
    """Per-(micro)batch generator + discriminator gradient computation for the
    dual-optimizer GAN path (shared by the jit step and the explicit shard_map
    step).

    `kernel_grad_sync` (e.g. a pmean over the data axis) is applied to the two
    conv_out-kernel gradients BEFORE the adaptive-weight ratio, so under
    explicit data parallelism d_weight is computed from global-batch gradients
    exactly as the jit/NamedSharding formulation does.

    Returns gan_grads(params, disc_params, disc_stats, frozen, x, batch, rngs,
    step) -> (g_grads, d_grads, new_batch_stats, logs); optimizer updates are
    applied by the caller (once per step, after optional microbatch/shard
    averaging)."""
    forward = make_forward_fn(model)
    decode_fn = make_decode_fn(model)
    sync = kernel_grad_sync or (lambda t: t)

    def gan_grads(params, disc_params, disc_stats, frozen, x, batch_mb, rngs, step):
        disc_vars = {"params": disc_params, "batch_stats": disc_stats}

        def run_model(p):
            outputs = forward(p, x, batch_mb, rngs, deterministic=False)
            kl_el = gaussian_kl(outputs["mean"], outputs["logvar"])
            kl_per_sample = jnp.sum(kl_el.reshape(kl_el.shape[0], -1), axis=1)
            return outputs, kl_per_sample

        # adaptive weight: grad w.r.t. the decoder conv_out kernel of the
        # perceptual loss vs the adversarial loss (reference vae_losses.py:370-382).
        # Only the decode-from-z path depends on that kernel, so the closures
        # re-run the DECODER alone on a stop_gradient'ed latent — the same
        # gradient as re-running the full model, at half the extra cost.
        outputs0, _ = run_model(params)
        z0 = jax.lax.stop_gradient(outputs0["z"])
        last_path = ("decoder", "conv_out", "kernel")

        def _with_last(p, kernel):
            sub = dict(p[last_path[0]])
            inner = dict(sub[last_path[1]])
            inner[last_path[2]] = kernel
            sub[last_path[1]] = inner
            out = dict(p)
            out[last_path[0]] = sub
            return out

        def p_of_kernel(kernel):
            recon = decode_fn(_with_last(params, kernel), z0, batch_mb)
            return gan_loss.rec_for_adaptive(frozen, x, recon)

        def g_of_kernel(kernel):
            recon = decode_fn(_with_last(params, kernel), z0, batch_mb)
            logits = disc.apply(disc_vars, discriminator_input(recon), train=False)
            return -jnp.mean(logits.astype(jnp.float32))

        kernel0 = params[last_path[0]][last_path[1]][last_path[2]]
        nll_grads = sync(jax.grad(p_of_kernel)(kernel0))
        gk_grads = sync(jax.grad(g_of_kernel)(kernel0))
        d_weight = adaptive_weight(nll_grads, gk_grads)

        def g_loss_fn(p):
            outputs, kl_per_sample = run_model(p)
            logits_fake = disc.apply(
                disc_vars,
                discriminator_input(outputs["reconstruction"]),
                train=False,
            )
            loss, log = gan_loss.generator_loss(
                frozen,
                x,
                outputs["reconstruction"],
                kl_per_sample,
                logits_fake,
                d_weight,
                step,
            )
            return loss, (log, outputs)

        (_, (g_log, outputs)), g_grads_full = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(params)

        # discriminator grads on detached reconstructions (reference :153-167)
        recon_detached = jax.lax.stop_gradient(outputs["reconstruction"])

        def d_loss_fn(dp):
            v = {"params": dp, "batch_stats": disc_stats}
            logits_real, mut1 = disc.apply(
                v, discriminator_input(x), train=True, mutable=["batch_stats"]
            )
            v2 = {"params": dp, "batch_stats": mut1["batch_stats"]}
            logits_fake, mut2 = disc.apply(
                v2,
                discriminator_input(recon_detached),
                train=True,
                mutable=["batch_stats"],
            )
            d_loss, d_log = gan_loss.discriminator_loss(
                logits_real, logits_fake, step
            )
            return d_loss, (d_log, mut2["batch_stats"])

        (_, (d_log, new_stats)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(disc_params)
        return g_grads_full, d_grads, new_stats, {**g_log, **d_log}

    return gan_grads


def build_train_step(
    model,
    loss_cfg: Dict[str, Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    augment: bool = False,
    normalize: bool = True,
    max_channels: int = 3,
    disc=None,
    disc_tx: Optional[optax.GradientTransformation] = None,
    donate: bool = True,
    ema_decay: float = 0.0,
    state_sharding=None,
    accumulate_grad_batches: int = 1,
    raw: bool = False,
):
    """Build the jitted train step. Returns step(state, batch, rng) -> (state, metrics).

    `raw=True` returns the UN-jitted step function instead — the building
    block for fused multi-step execution (train/multistep.py), where several
    steps run inside one `lax.scan` per device dispatch.

    `state_sharding`: optional sharding pytree for the train state (tensor
    parallelism over the `model` axis) — defaults to fully replicated.
    `accumulate_grad_batches` k > 1 (named for the Lightning knob, reference
    main.py:92) SPLITS the batch into k microbatches scanned sequentially
    with gradient averaging — one optimizer update per batch, 1/k peak
    activation memory. NB this differs from Lightning, which accumulates k
    whole loader batches (effective batch k·b); here the effective batch
    stays b. Consequence: losses with batch-global terms (the disentangled
    separation/contrastive losses) see only b/k samples per forward — the
    Trainer fails fast on that combination (trainer.py guard) unless
    explicitly allowed."""
    forward = make_forward_fn(model)
    loss_type = str(loss_cfg.get("type", "vae"))
    use_gan = loss_type == "lpips_discriminator"
    gan_loss = make_gan_loss(loss_cfg) if use_gan else None
    criterion = None if use_gan else make_criterion(loss_cfg, model)
    compute_dtype = getattr(model, "dtype", jnp.float32)

    def _rngs(rng, step):
        k = jax.random.fold_in(rng, step)
        ks, kd, ka = jax.random.split(k, 3)
        return {"sample": ks, "dropout": kd}, ka

    # ---------------- standard single-optimizer path ----------------------
    def train_step(state: TrainState, batch, rng):
        rngs, k_aug = _rngs(rng, state.step)
        x = preprocess(
            batch,
            k_aug,
            augment=augment,
            normalize=normalize,
            max_channels=max_channels,
            dtype=compute_dtype,
        )

        def loss_fn(params, x_mb, batch_mb, mb_rngs):
            outputs = forward(params, x_mb, batch_mb, mb_rngs, deterministic=False)
            loss_dict = criterion(state.frozen, outputs, x_mb)
            return loss_dict["loss"], loss_dict

        k = accumulate_grad_batches
        if k <= 1:
            (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, batch, rngs
            )
        else:
            # microbatch scan: (b,) -> (k, b/k), grads averaged across chunks
            if x.shape[0] % k != 0:
                raise ValueError(
                    f"batch size {x.shape[0]} not divisible by "
                    f"accumulate_grad_batches={k}"
                )

            def split(t):
                return t.reshape(k, t.shape[0] // k, *t.shape[1:])

            x_mb = split(x)
            batch_mb = jax.tree_util.tree_map(split, batch)

            def body(carry, inp):
                grad_acc, loss_acc = carry
                i, x_i, b_i = inp
                mb_rngs = {
                    name: jax.random.fold_in(key, i) for name, key in rngs.items()
                }
                (_, ld), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, x_i, b_i, mb_rngs
                )
                grad_acc = jax.tree_util.tree_map(jnp.add, grad_acc, g)
                loss_acc = jax.tree_util.tree_map(jnp.add, loss_acc, ld)
                return (grad_acc, loss_acc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            zero_l = jax.eval_shape(
                lambda: loss_fn(
                    state.params,
                    x_mb[0],
                    jax.tree_util.tree_map(lambda t: t[0], batch_mb),
                    rngs,
                )[1]
            )
            zero_l = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), zero_l
            )
            (grads, loss_dict), _ = jax.lax.scan(
                body,
                (zero_g, zero_l),
                (jnp.arange(k), x_mb, batch_mb),
            )
            grads = jax.tree_util.tree_map(lambda g: g / k, grads)
            loss_dict = jax.tree_util.tree_map(lambda v: v / k, loss_dict)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # host-driven plateau LR: scaling the final update == scaling the LR
        updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if ema_decay and new_ema is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema,
                new_params,
            )
        metrics = {f"train/{k}": v for k, v in loss_dict.items()}
        metrics["train/grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    # ---------------- GAN dual-optimizer path ------------------------------
    _gan_grads = (
        make_gan_grads_fn(model, disc, gan_loss) if use_gan else None
    )

    def gan_train_step(state: TrainState, batch, rng):
        rngs, k_aug = _rngs(rng, state.step)
        x = preprocess(
            batch,
            k_aug,
            augment=augment,
            normalize=normalize,
            max_channels=max_channels,
            dtype=compute_dtype,
        )

        k = accumulate_grad_batches
        if k <= 1:
            g_grads_full, d_grads, new_stats, logs = _gan_grads(
                state.params, state.disc_params, state.disc_batch_stats,
                state.frozen, x, batch, rngs, state.step,
            )
        else:
            # microbatch scan (the Lightning accumulate_grad_batches knob in
            # manual-optimization mode): G and D grads averaged over k chunks,
            # ONE update per optimizer; BatchNorm stats thread sequentially
            if x.shape[0] % k != 0:
                raise ValueError(
                    f"batch size {x.shape[0]} not divisible by "
                    f"accumulate_grad_batches={k}"
                )

            def split(t):
                return t.reshape(k, t.shape[0] // k, *t.shape[1:])

            x_mb = split(x)
            batch_mb = jax.tree_util.tree_map(split, batch)

            def body(carry, inp):
                g_acc, d_acc, stats, log_acc = carry
                i, x_i, b_i = inp
                mb_rngs = {
                    name: jax.random.fold_in(key, i) for name, key in rngs.items()
                }
                g_g, d_g, new_stats_i, logs_i = _gan_grads(
                    state.params, state.disc_params, stats, state.frozen,
                    x_i, b_i, mb_rngs, state.step,
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g_g)
                d_acc = jax.tree_util.tree_map(jnp.add, d_acc, d_g)
                log_acc = jax.tree_util.tree_map(jnp.add, log_acc, logs_i)
                return (g_acc, d_acc, new_stats_i, log_acc), None

            zero_g = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )
            zero_d = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.disc_params
            )
            log_shapes = jax.eval_shape(
                lambda: _gan_grads(
                    state.params, state.disc_params, state.disc_batch_stats,
                    state.frozen, x_mb[0],
                    jax.tree_util.tree_map(lambda t: t[0], batch_mb),
                    rngs, state.step,
                )[3]
            )
            zero_log = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, jnp.float32), log_shapes
            )
            (g_grads_full, d_grads, new_stats, logs), _ = jax.lax.scan(
                body,
                (zero_g, zero_d, state.disc_batch_stats, zero_log),
                (jnp.arange(k), x_mb, batch_mb),
            )
            g_grads_full = jax.tree_util.tree_map(lambda g: g / k, g_grads_full)
            d_grads = jax.tree_util.tree_map(lambda g: g / k, d_grads)
            logs = jax.tree_util.tree_map(lambda v: v / k, logs)

        g_updates, new_opt = tx.update(g_grads_full, state.opt_state, state.params)
        # host-driven plateau LR applies to BOTH optimizers (the disc already
        # runs at lr·0.5 via its own schedule; lr_scale composes on top)
        g_updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, g_updates)
        new_params = optax.apply_updates(state.params, g_updates)
        d_updates, new_disc_opt = disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        d_updates = jax.tree_util.tree_map(lambda u: u * state.lr_scale, d_updates)
        new_disc_params = optax.apply_updates(state.disc_params, d_updates)
        new_ema = state.ema_params
        if ema_decay and new_ema is not None:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                new_ema,
                new_params,
            )

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
            disc_params=new_disc_params,
            disc_batch_stats=new_stats,
            disc_opt_state=new_disc_opt,
        )
        return new_state, logs

    fn = gan_train_step if use_gan else train_step
    if raw:
        return fn
    repl, _ = _shardings(mesh)
    jitted = jax.jit(
        fn,
        donate_argnums=(0,) if donate else (),
        out_shardings=(state_sharding if state_sharding is not None else repl, repl),
    )
    return jitted


def build_eval_step(
    model,
    loss_cfg: Dict[str, Any],
    mesh: Mesh,
    *,
    normalize: bool = True,
    max_channels: int = 3,
    disc=None,
    n_modalities: int = 0,
    raw: bool = False,
):
    """Eval step: forward (no dropout) + loss + recon/KL/latent metrics, all
    masked by batch validity (reference validation_step :220-311).

    `raw=True` returns the un-jitted step (for fused whole-split evaluation,
    train/multistep.py).

    NB (disentangled model): val/separation_loss and val/contrastive_loss are
    per-batch quantities; the unshuffled val split is modality-contiguous
    (concatenated datasets), so most eval batches hold ONE modality and the
    terms degenerate to 0 — the same thing the reference's per-batch
    validation_step produces. The TRAIN separation term is also a shaky
    separation readout: with ~B/M samples per modality per batch, centroid
    distances carry O(sigma*sqrt(2D*M/B)) sampling noise (measured: train
    separation −72 while the whole-split centroid distance was 0.8).
    Honest separation numbers are `val/centroid_distance` (exact whole-split
    centroids, emitted below) and cli/analyze.py.

    For the GAN loss (`disc` given), val terms follow the reference's
    validation semantics (lightning_module.py:264-273 with split="val"):
    val/loss = perceptual_factor·LPIPS + kl_factor·KL (+ clip term), with
    d_weight = 0 — the reference's calculate_adaptive_weight raises under
    no_grad and falls back to 0 (vae_losses.py:306-311). val/g_loss and
    val/d_loss are logged for observability, so plateau scheduling /
    checkpoint best-k monitor a metric the GAN run actually optimizes."""
    forward = make_forward_fn(model)
    loss_type = str(loss_cfg.get("type", "vae"))
    use_gan = loss_type == "lpips_discriminator" and disc is not None
    if use_gan:
        gan_loss = make_gan_loss(loss_cfg)
        criterion = None
    else:
        if loss_type == "lpips_discriminator":
            # no discriminator module supplied: fall back to the plain VAE
            # objective components (recon metrics dominate)
            criterion = make_criterion({"type": "vae"}, model)
        else:
            criterion = make_criterion(loss_cfg, model)
    compute_dtype = getattr(model, "dtype", jnp.float32)
    # per-modality breakdown width: the 12 MedMNIST modalities by default,
    # widened when a model declares more (fixes the silent truncation the
    # hardcoded 12 would cause for num_modalities > 12)
    from medvae_tpu.data.medmnist import MODALITY_NAMES as _MODS

    n_mod = max(
        n_modalities, len(_MODS), int(getattr(model, "num_modalities", 0) or 0)
    )

    def eval_step(state: TrainState, batch, rng):
        rngs = {"sample": jax.random.fold_in(rng, state.step)}
        x = preprocess(
            batch, None, augment=False, normalize=normalize,
            max_channels=max_channels, dtype=compute_dtype,
        )
        outputs = forward(state.params, x, batch, rngs, deterministic=True)
        if use_gan:
            disc_vars = {
                "params": state.disc_params,
                "batch_stats": state.disc_batch_stats,
            }
            kl_el = gaussian_kl(outputs["mean"], outputs["logvar"])
            kl_per_sample = jnp.sum(kl_el.reshape(kl_el.shape[0], -1), axis=1)
            logits_fake = disc.apply(
                disc_vars,
                discriminator_input(outputs["reconstruction"]),
                train=False,
            )
            loss, g_log = gan_loss.generator_loss(
                state.frozen, x, outputs["reconstruction"], kl_per_sample,
                logits_fake, jnp.asarray(0.0, jnp.float32),  # d_weight=0 in val
                state.step, split="val",
            )
            logits_real = disc.apply(
                disc_vars, discriminator_input(x), train=False
            )
            _, d_log = gan_loss.discriminator_loss(
                logits_real, logits_fake, state.step, split="val"
            )
            loss_dict = {"loss": loss}
            loss_dict.update(
                {k.split("/", 1)[1]: v for k, v in {**g_log, **d_log}.items()}
            )
        else:
            loss_dict = criterion(state.frozen, outputs, x)
        valid = batch.get("valid")
        metrics = {f"val/{k}": v for k, v in loss_dict.items()}
        metrics.update(
            {f"val/{k}": v for k, v in reconstruction_metrics(
                outputs["reconstruction"], x, valid
            ).items()}
        )
        metrics.update(
            {f"val/{k}": v for k, v in kl_metrics(
                outputs["mean"], outputs["logvar"], valid
            ).items()}
        )
        metrics.update(
            {f"val/{k}": v for k, v in latent_metrics(outputs["z"], valid).items()}
        )
        v = valid if valid is not None else jnp.ones((x.shape[0],))
        metrics["val/_weight"] = jnp.sum(v)
        # per-modality PSNR breakdown (multi-modal evaluation)
        from medvae_tpu.train.metrics import psnr as _psnr

        onehot = jax.nn.one_hot(batch["modality_idx"], n_mod, dtype=jnp.float32)
        onehot = onehot * v[:, None]
        per_sample = _psnr(
            outputs["reconstruction"].astype(jnp.float32), x.astype(jnp.float32)
        )
        metrics["val/_psnr_by_mod"] = jnp.sum(per_sample[:, None] * onehot, axis=0)
        metrics["val/_count_by_mod"] = jnp.sum(onehot, axis=0)
        if isinstance(model, DisentangledConditionalVAE):
            # per-modality z_modality sums (valid-masked): validate() derives
            # the exact WHOLE-SPLIT centroid distance from these — the
            # research memo's headline disentanglement metric
            # (MODALITY_SEPARATION_RESEARCH.md: centroid distance > 10),
            # which the per-batch separation term cannot provide on the
            # modality-contiguous val split (see NB above)
            _, z_mod = model.partition_latent(outputs["z"])
            zm = z_mod.astype(jnp.float32) * v[:, None]
            metrics["val/_zmod_sum_by_mod"] = onehot.T @ zm
        return metrics

    if raw:
        return eval_step
    repl, _ = _shardings(mesh)
    return jax.jit(eval_step, out_shardings=repl)
