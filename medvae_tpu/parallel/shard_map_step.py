"""Explicit shard_map data-parallel train step.

The reference has no distributed story at all (Lightning devices: 1, SURVEY
§2.3); this module is the TPU-native equivalent of the DDP/NCCL layer it lacks:
the batch is split over the mesh's `data` axis, each shard runs the model
locally, gradients are averaged with `jax.lax.pmean` over ICI, and the two
batch-global disentanglement losses (modality separation + InfoNCE contrastive,
which couple *all* samples in the batch) are computed on an `all_gather`ed
latent so multi-chip training is bit-equivalent to single-chip large-batch
training — not an approximation over per-shard sub-batches.

The default training path (train/step.py) uses jit + NamedShardings and lets
XLA insert the same collectives; this explicit version exists (a) as the
documented collective design, (b) for the driver's multi-chip dry-run, and
(c) as an A/B lever if XLA's automatic partitioning ever schedules the
collectives suboptimally.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medvae_tpu.core.mesh import DATA_AXIS
from medvae_tpu.models import DisentangledConditionalVAE
from medvae_tpu.train.state import TrainState
from medvae_tpu.train.step import (
    make_criterion,
    make_forward_fn,
    make_gan_grads_fn,
    make_gan_loss,
    preprocess,
)


def build_shard_map_train_step(
    model,
    loss_cfg: Dict[str, Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    augment: bool = False,
    normalize: bool = True,
    max_channels: int = 3,
    donate: bool = True,
    ema_decay: float = 0.0,
):
    """Returns step(state, batch, rng) -> (state, metrics); batch axis must be
    divisible by the mesh's data-axis size."""
    if "dcn" in mesh.axis_names:
        raise NotImplementedError(
            "the explicit shard_map steps address the single-slice (data, "
            "model) mesh; cross-host (dcn) training uses the default jit + "
            "NamedSharding path (core/mesh.py, scripts/dcn_dryrun.py)"
        )
    forward = make_forward_fn(model)
    criterion = make_criterion(loss_cfg, model)
    compute_dtype = getattr(model, "dtype", jnp.float32)
    is_disentangled = isinstance(model, DisentangledConditionalVAE)

    def shard_fn(state: TrainState, batch, rng):
        # per-shard RNG: fold in the data-axis index so every shard draws
        # distinct sampling/augmentation noise
        axis = jax.lax.axis_index(DATA_AXIS)
        k = jax.random.fold_in(jax.random.fold_in(rng, state.step), axis)
        ks, kd, ka = jax.random.split(k, 3)
        rngs = {"sample": ks, "dropout": kd}

        x = preprocess(
            batch,
            ka,
            augment=augment,
            normalize=normalize,
            max_channels=max_channels,
            dtype=compute_dtype,
        )

        def loss_fn(params):
            outputs = forward(params, x, batch, rngs, deterministic=False)
            if is_disentangled:
                # batch-global losses over the gathered latent: exact
                # large-batch semantics across shards
                z_all = jax.lax.all_gather(
                    outputs["z"], DATA_AXIS, axis=0, tiled=True
                )
                midx_all = jax.lax.all_gather(
                    batch["modality_idx"], DATA_AXIS, axis=0, tiled=True
                )
                outputs = dict(outputs)
                outputs["separation_loss"] = model.apply(
                    {"params": params},
                    z_all,
                    midx_all,
                    method=model.modality_separation_loss,
                )
                outputs["contrastive_loss"] = model.apply(
                    {"params": params},
                    z_all,
                    midx_all,
                    method=model.contrastive_loss,
                )
            loss_dict = criterion(state.frozen, outputs, x)
            return loss_dict["loss"], loss_dict

        (_, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # the NCCL-all-reduce analogue: gradient mean over ICI
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss_dict = jax.lax.pmean(loss_dict, DATA_AXIS)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        # host-driven plateau LR, same as the jit step (train/step.py)
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
            step=state.step + 1, params=new_params, opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    state_spec = P()  # replicated

    # Batch specs are derived from the actual batch keys (every entry is
    # batch-leading and shards over the data axis) so optional entries — e.g.
    # the per-sample reparameterization `noise` used by the equivalence
    # tests — ride along without a fixed schema.
    cache: Dict[tuple, Any] = {}

    def step(state: TrainState, batch, rng):
        key = tuple(sorted(batch.keys()))
        if key not in cache:
            batch_spec = {k: P(DATA_AXIS) for k in key}
            sharded = shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(state_spec, batch_spec, P()),
                out_specs=(state_spec, state_spec),
                check_rep=False,
            )
            cache[key] = jax.jit(
                sharded, donate_argnums=(0,) if donate else ()
            )
        return cache[key](state, batch, rng)

    return step


def build_shard_map_gan_step(
    model,
    loss_cfg: Dict[str, Any],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    disc,
    disc_tx: optax.GradientTransformation,
    *,
    augment: bool = False,
    normalize: bool = True,
    max_channels: int = 3,
    donate: bool = True,
    ema_decay: float = 0.0,
):
    """Explicit shard_map variant of the dual-optimizer GAN step.

    Semantics match the jit/NamedSharding GAN step over the global batch:
      * generator and discriminator gradients are pmean'd over the data axis,
      * the adaptive d_weight is computed from GLOBAL conv_out-kernel grads
        (pmean'd before the norm ratio),
      * discriminator BatchNorm runs in sync-BN mode (flax axis_name) so the
        moments are global-batch moments — exactly what XLA's automatic
        partitioning produces for the jit step.
    Numerical equivalence is enforced by tests/test_train.py
    (test_gan_jit_and_shard_map_steps_agree).
    """
    if "dcn" in mesh.axis_names:
        raise NotImplementedError(
            "the explicit shard_map steps address the single-slice (data, "
            "model) mesh; cross-host (dcn) training uses the default jit + "
            "NamedSharding path (core/mesh.py, scripts/dcn_dryrun.py)"
        )
    # sync-BN clone: same params/stats tree, cross-shard moments during train
    disc_sync = disc.clone(bn_axis_name=DATA_AXIS)
    gan_loss = make_gan_loss(loss_cfg)
    gan_grads = make_gan_grads_fn(
        model, disc_sync, gan_loss,
        kernel_grad_sync=lambda t: jax.lax.pmean(t, DATA_AXIS),
    )
    compute_dtype = getattr(model, "dtype", jnp.float32)

    def shard_fn(state: TrainState, batch, rng):
        axis = jax.lax.axis_index(DATA_AXIS)
        k = jax.random.fold_in(jax.random.fold_in(rng, state.step), axis)
        ks, kd, ka = jax.random.split(k, 3)
        rngs = {"sample": ks, "dropout": kd}

        x = preprocess(
            batch,
            ka,
            augment=augment,
            normalize=normalize,
            max_channels=max_channels,
            dtype=compute_dtype,
        )
        g_grads, d_grads, new_stats, logs = gan_grads(
            state.params, state.disc_params, state.disc_batch_stats,
            state.frozen, x, batch, rngs, state.step,
        )
        g_grads = jax.lax.pmean(g_grads, DATA_AXIS)
        d_grads = jax.lax.pmean(d_grads, DATA_AXIS)
        logs = jax.lax.pmean(logs, DATA_AXIS)
        # sync-BN makes per-shard running stats identical; pmean is a no-op
        # numerically but re-establishes replication for the out_spec
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)

        g_updates, new_opt = tx.update(g_grads, state.opt_state, state.params)
        # plateau lr_scale applies to BOTH optimizers, same as the jit step
        g_updates = jax.tree_util.tree_map(
            lambda u: u * state.lr_scale, g_updates
        )
        new_params = optax.apply_updates(state.params, g_updates)
        d_updates, new_disc_opt = disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        d_updates = jax.tree_util.tree_map(
            lambda u: u * state.lr_scale, d_updates
        )
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

    state_spec = P()
    cache: Dict[tuple, Any] = {}

    def step(state: TrainState, batch, rng):
        key = tuple(sorted(batch.keys()))
        if key not in cache:
            batch_spec = {k: P(DATA_AXIS) for k in key}
            sharded = shard_map(
                shard_fn,
                mesh=mesh,
                in_specs=(state_spec, batch_spec, P()),
                out_specs=(state_spec, state_spec),
                check_rep=False,
            )
            cache[key] = jax.jit(
                sharded, donate_argnums=(0,) if donate else ()
            )
        return cache[key](state, batch, rng)

    return step
