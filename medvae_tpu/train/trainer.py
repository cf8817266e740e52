"""Training orchestration.

Replaces `L.Trainer` + `VAELightningModule` (reference main.py:86-120,
src/lightning_module.py) with an explicit loop over jitted steps:

  * mesh + precision policy from config (core/)
  * model built from the Hydra-style config via instantiate()
  * DeviceFeeder streaming uint8 batches sharded over the mesh
  * jit train step (XLA-inserted collectives) or the explicit shard_map step
  * per-epoch (or mid-epoch, val_check_interval) validation with on-device
    metric accumulation
  * orbax checkpointing (best-k / last / final), early stopping, metric logging
  * optional jax.profiler trace around the first steps (--profile / cfg.debug)

The forward/loss math lives in train/step.py; this file is control flow only.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.config import instantiate
from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate
from medvae_tpu.core.rng import set_seed
from medvae_tpu.data.medmnist import MedMNISTDataModule
from medvae_tpu.data.pipeline import DeviceFeeder
from medvae_tpu.losses.perceptual import BiomedCLIPLoss
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
from medvae_tpu.nn.discriminator import NLayerDiscriminator
from medvae_tpu.train.checkpoint import CheckpointManager
from medvae_tpu.train.optim import build_optimizer, discriminator_optimizer
from medvae_tpu.train.state import create_train_state, param_count
from medvae_tpu.train.step import build_eval_step, build_train_step, make_gan_loss
from medvae_tpu.utils.logging import MetricLogger
from medvae_tpu.utils.training_utils import EarlyStopping


# training.fused_steps=auto fuses multi-step/whole-split execution only when
# at least this many dispatches would be saved over the run — each distinct
# fused chunk size costs one extra XLA compile, so short runs lose by fusing
FUSED_AUTO_MIN_STEPS = int(os.environ.get("MEDVAE_FUSED_MIN_STEPS", 200))


_REMAT_UNSET = object()


def build_model(
    model_cfg: Dict[str, Any],
    precision: str = "bf16",
    use_pallas: bool = True,
    remat: Any = _REMAT_UNSET,
):
    """Instantiate a model from config with the TPU precision policy applied.

    `remat` overrides the config's remat field (the Trainer's `remat: auto`
    resolution rebuilds the model at the probed rung; remat wrappers are
    parameter-transparent so existing variables stay valid)."""
    from medvae_tpu.core.precision import default_policy

    policy = default_policy(mixed=str(precision) in ("bf16", "16", "bfloat16"))
    extra = {"dtype": policy.compute_dtype, "use_pallas": bool(use_pallas)}
    cfg = dict(model_cfg)
    if remat is not _REMAT_UNSET:
        cfg.pop("remat", None)
        extra["remat"] = remat
    # default at high resolutions is `auto`: the Trainer probes the device
    # (train/autoremat.py) and keeps the cheapest rung that fits — no remat
    # is +12% step throughput over block remat when HBM allows
    # (ops/PERF_224.md). Outside the Trainer — and as the Trainer's
    # pre-probe build — `auto` means the safe "full" rung (whole
    # encoder/decoder; block-level still OOMs at 224² bs128).
    elif str(cfg.get("remat", "")).lower() == "auto" or (
        "remat" not in cfg and int(cfg.get("resolution", 28)) >= 112
    ):
        cfg.pop("remat", None)
        extra["remat"] = "full"
    # tuples for hashable flax fields
    for k in ("ch_mult", "attn_resolutions"):
        if k in cfg and isinstance(cfg[k], list):
            cfg[k] = tuple(cfg[k])
    if "modalities" in cfg and isinstance(cfg["modalities"], list):
        cfg["modalities"] = tuple(cfg["modalities"])
    return instantiate(cfg, **extra)


def init_model_variables(model, datamodule: MedMNISTDataModule, rng: jax.Array):
    """Initialize params with a dummy batch of the right shapes (jitted so
    initialization is ONE compiled program, not dozens of eager op compiles —
    matters a lot when the backend is a remote tunnel)."""
    c = datamodule.max_channels
    x = jnp.zeros((2, datamodule.size, datamodule.size, c), model.dtype)
    rngs = {"params": rng, "sample": jax.random.fold_in(rng, 1)}
    if isinstance(model, DisentangledConditionalVAE):
        return jax.jit(model.init)(rngs, x, jnp.zeros((2,), jnp.int32))
    if isinstance(model, ConditionalVAE):
        cond = jnp.zeros((2, model.cond_dim), model.dtype)
        return jax.jit(model.init)(rngs, x, cond)
    return jax.jit(model.init)(rngs, x)


class Trainer:
    def __init__(self, cfg: Dict[str, Any]):
        self.cfg = cfg
        self._feeders: Dict[Any, Any] = {}
        self.seed_key = set_seed(int(cfg.get("seed", 42)))
        mesh_cfg = cfg.get("mesh", {}) or {}
        self.mesh = create_mesh(
            MeshSpec(
                data=int(mesh_cfg.get("data", -1)), model=int(mesh_cfg.get("model", 1))
            )
        )

        # data ---------------------------------------------------------------
        data_cfg = dict(cfg["data"])
        # data.batch_size=auto: resolved below by probing the device (the
        # datamodule is built with a placeholder, overwritten before use)
        self._auto_bs = str(data_cfg.get("batch_size", "")).lower() == "auto"
        if self._auto_bs:
            data_cfg["batch_size"] = 64
        self.datamodule: MedMNISTDataModule = instantiate(data_cfg)
        self.datamodule.setup(None)

        # model ---------------------------------------------------------------
        # remat "auto" (the default at resolution ≥112): build at the safe
        # "full" rung now, probe the device for the cheapest fitting rung
        # once the production step's full memory picture (optimizer, frozen
        # nets, batch size) exists below
        _mcfg = dict(cfg["model"])
        _remat_req = _mcfg.get(
            "remat", "auto" if int(_mcfg.get("resolution", 28)) >= 112 else False
        )
        self._auto_remat = str(_remat_req).lower() == "auto"
        self._resolved_remat = None  # rung chosen by remat=auto (persisted)
        # checkpoint dir, needed before the remat probe (recorded-rung reuse
        # on resume); the CheckpointManager below uses the same expression
        ckpt_dir_early = os.path.join(
            cfg.get("checkpoint_dir", "logs/checkpoints"),
            cfg.get("experiment_name", "run"),
        )
        self.model = build_model(
            cfg["model"],
            precision=cfg.get("precision", "bf16"),
            use_pallas=bool(cfg.get("use_pallas", True)),
        )
        self.variables = init_model_variables(
            self.model, self.datamodule, self.seed_key
        )
        params = self.variables["params"]
        n_params = param_count(params)
        print(f"Model: {type(self.model).__name__}  ({n_params:,} parameters)")
        self._validate_geometry()

        tcfg = cfg["training"]
        self.loss_cfg = dict(tcfg.get("loss", {"type": "vae"}))
        if "discriminator" in tcfg:
            self.loss_cfg.setdefault("discriminator", dict(tcfg["discriminator"]))

        # GAN extras (before batch sizing: the auto-batch probe must carry
        # the run's full memory footprint — frozen nets + discriminator) -----
        use_gan = str(self.loss_cfg.get("type")) == "lpips_discriminator"
        disc = disc_vars = disc_tx = None
        frozen = {}
        if use_gan:
            dcfg = dict(self.loss_cfg.get("discriminator") or
                        {"input_nc": 3, "ndf": 64, "n_layers": 3})
            disc = NLayerDiscriminator(**dcfg)
            disc_vars = disc.init(
                jax.random.fold_in(self.seed_key, 7),
                jnp.zeros((2, self.datamodule.size, self.datamodule.size, 3)),
                train=False,
            )
            logit_shape = jax.eval_shape(
                lambda v: disc.apply(
                    v,
                    jnp.zeros((1, self.datamodule.size, self.datamodule.size, 3)),
                    train=False,
                ),
                disc_vars,
            ).shape
            if any(s <= 0 for s in logit_shape):
                raise ValueError(
                    f"Discriminator emits an empty logit map {logit_shape} at "
                    f"image size {self.datamodule.size}; reduce n_layers or "
                    f"increase the image size"
                )
            gan_loss = make_gan_loss(self.loss_cfg)
            frozen = gan_loss.init_frozen(
                jax.random.fold_in(self.seed_key, 11), self.datamodule.size
            )
        elif str(self.loss_cfg.get("type")) == "lpips":
            from medvae_tpu.losses.perceptual import LPIPSLoss

            # loss.weights_path: pretrained AlexNet graft (npz emitted by
            # scripts/export_torch_weights.py); absent → fixed-seed random
            # trunk (banner printed by LPIPSLoss.init)
            frozen = {
                "lpips": LPIPSLoss(
                    weights_path=self.loss_cfg.get("weights_path") or None
                ).init(
                    jax.random.fold_in(self.seed_key, 11), self.datamodule.size
                )
            }
        elif str(self.loss_cfg.get("type")) == "biomedclip":
            frozen = {
                "clip": BiomedCLIPLoss(
                    encoder=self.loss_cfg.get("clip_encoder", "simple"),
                    weights_path=self.loss_cfg.get("clip_weights_path")
                    or None,
                ).init(jax.random.fold_in(self.seed_key, 11))
            }
        elif str(self.loss_cfg.get("type")) == "disentangled_vae":
            # full flagship: disentangled ELBO + optional LPIPS / BiomedCLIP
            # feature terms (loss.perceptual_weight / loss.biomedclip_weight)
            if float(self.loss_cfg.get("perceptual_weight", 0.0) or 0.0):
                from medvae_tpu.losses.perceptual import LPIPSLoss

                frozen["lpips"] = LPIPSLoss(
                    weights_path=self.loss_cfg.get("weights_path") or None
                ).init(
                    jax.random.fold_in(self.seed_key, 11), self.datamodule.size
                )
            if float(self.loss_cfg.get("biomedclip_weight", 0.0) or 0.0):
                frozen["clip"] = BiomedCLIPLoss(
                    encoder=self.loss_cfg.get("clip_encoder", "simple"),
                    weights_path=self.loss_cfg.get("clip_weights_path")
                    or None,
                ).init(jax.random.fold_in(self.seed_key, 13))

        # batch size + optimizers (data.batch_size=auto probes the largest
        # batch that fits device memory with the production step) -------------
        if self._auto_bs:
            from medvae_tpu.train.autobatch import resolve_auto_batch_size

            self.datamodule.batch_size = resolve_auto_batch_size(
                self.model, self.datamodule, self.mesh, self.loss_cfg,
                params, self.seed_key, frozen=frozen, disc=disc,
                disc_vars=disc_vars,
                start=int(tcfg.get("autobatch_start", 64) or 64),
                max_batch=int(tcfg.get("autobatch_max", 65536) or 65536),
                max_probes=int(tcfg.get("autobatch_probes", 16) or 16),
                ballast_bytes=self._projected_cache_bytes(),
            )
        bs = int(self.datamodule.batch_size)
        steps_per_epoch = max(1, len(self.datamodule.train_arrays) // bs)
        self.steps_per_epoch = steps_per_epoch

        self.tx = build_optimizer(
            dict(tcfg.get("optimizer", {})),
            dict(tcfg.get("scheduler", {}) or {}),
            steps_per_epoch=steps_per_epoch,
            gradient_clip_val=tcfg.get("gradient_clip_val", 1.0),
        )
        if use_gan:
            disc_tx = discriminator_optimizer(
                dict(tcfg.get("optimizer", {})),
                dict(tcfg.get("scheduler", {}) or {}),
                steps_per_epoch=steps_per_epoch,
                gradient_clip_val=tcfg.get("gradient_clip_val", 1.0),
            )

        self.ema_decay = float(tcfg.get("ema_decay", 0.0) or 0.0)
        self.state = create_train_state(
            params, self.tx, frozen=frozen, disc_variables=disc_vars,
            disc_tx=disc_tx, ema_decay=self.ema_decay,
        )
        # mesh.model > 1 turns on tensor parallelism: conv kernels shard their
        # output channels over the model axis; XLA SPMD inserts the collectives
        self._state_sharding = None
        if self.mesh.shape.get("model", 1) > 1:
            from medvae_tpu.parallel import shard_state, state_shardings

            self._state_sharding = state_shardings(self.state, self.mesh)
            self.state = shard_state(self.state, self.mesh)
        else:
            self.state = replicate(self.mesh, self.state)

        # ReduceLROnPlateau (reference training_utils.py:49-55): host-driven
        # lr_scale update on monitored-metric stagnation
        sched_cfg = dict(tcfg.get("scheduler", {}) or {})
        self._plateau = None
        if str(sched_cfg.get("type", "")).lower() == "plateau":
            self._plateau = {
                "factor": float(sched_cfg.get("factor", 0.1)),
                "patience": int(sched_cfg.get("patience", 10)),
                "monitor": str(sched_cfg.get("monitor", "val/loss")),
                "best": None,
                "count": 0,
            }
        self._monitors_checked = False

        # `parallel.explicit_shard_map: true` switches the train step to the
        # explicit shard_map/psum formulation (parallel/shard_map_step.py);
        # default lets XLA insert the collectives from NamedShardings. The two
        # are numerically equivalent (tested on the 8-device CPU mesh).
        explicit_sm = bool(
            (cfg.get("parallel") or {}).get("explicit_shard_map", False)
        )
        if explicit_sm and int(tcfg.get("accumulate_grad_batches", 1) or 1) > 1:
            raise NotImplementedError(
                "training.accumulate_grad_batches > 1 is only supported by "
                "the default jit step; drop parallel.explicit_shard_map "
                "(the jit step emits the same collectives) or set "
                "accumulate_grad_batches=1"
            )
        # Gradient accumulation SPLITS each batch into k microbatches
        # (train/step.py: same effective batch, 1/k activation memory). The
        # disentangled model's separation/contrastive losses are batch-global
        # — computed inside each forward — so a k-way split silently
        # degenerates them (tiny microbatches lose same-modality positives
        # and centroid statistics). Fail fast instead of training a flagship
        # run whose headline losses are no-ops.
        if (
            str(self.loss_cfg.get("type")) == "disentangled_vae"
            and int(tcfg.get("accumulate_grad_batches", 1) or 1) > 1
            and not bool(tcfg.get("allow_microbatched_disentangled", False))
        ):
            k = int(tcfg.get("accumulate_grad_batches"))
            mb = int(self.datamodule.batch_size) // max(k, 1)
            raise ValueError(
                f"accumulate_grad_batches={k} would compute the batch-global "
                f"separation/contrastive losses on {mb}-sample microbatches "
                f"(batch {self.datamodule.batch_size} is split, not "
                f"multiplied). Use a full batch with remat instead, or set "
                f"+training.allow_microbatched_disentangled=true if the "
                f"microbatch size still covers every modality."
            )
        if self._auto_remat and explicit_sm:
            # the probe below only covers the default jit step; say so
            # instead of silently charging the ~12% 'full'-rung recompute
            print(
                "remat=auto: probing is skipped on the explicit shard_map "
                "step; using the safe 'full' rung (set model.remat "
                "explicitly to avoid its ~12% recompute cost if HBM allows)"
            )
        if explicit_sm and use_gan:
            from medvae_tpu.parallel import build_shard_map_gan_step

            self.train_step = build_shard_map_gan_step(
                self.model,
                self.loss_cfg,
                self.tx,
                self.mesh,
                disc,
                disc_tx,
                augment=bool(self.datamodule.augment_train),
                normalize=bool(self.datamodule.normalize),
                max_channels=self.datamodule.max_channels,
                ema_decay=self.ema_decay,
            )
        elif explicit_sm:
            from medvae_tpu.parallel import build_shard_map_train_step

            self.train_step = build_shard_map_train_step(
                self.model,
                self.loss_cfg,
                self.tx,
                self.mesh,
                augment=bool(self.datamodule.augment_train),
                normalize=bool(self.datamodule.normalize),
                max_channels=self.datamodule.max_channels,
                ema_decay=self.ema_decay,
            )
        else:
            # kept for fused multi-step execution (fit() builds the raw,
            # un-jitted step with exactly these arguments)
            self._step_kwargs = dict(
                model=self.model,
                loss_cfg=self.loss_cfg,
                tx=self.tx,
                mesh=self.mesh,
                augment=bool(self.datamodule.augment_train),
                normalize=bool(self.datamodule.normalize),
                max_channels=self.datamodule.max_channels,
                disc=disc,
                disc_tx=disc_tx,
                ema_decay=self.ema_decay,
                state_sharding=self._state_sharding,
                accumulate_grad_batches=int(
                    tcfg.get("accumulate_grad_batches", 1) or 1
                ),
            )
            if self._auto_remat and self._auto_bs:
                print(
                    "remat=auto: probing is skipped under batch_size=auto "
                    "(the batch probe already maxed memory against the safe "
                    "'full' rung); effective remat='full'"
                )
            if self._auto_remat and not self._auto_bs:
                # probe the remat ladder with the production step; the
                # winning rung's compile lands in the persistent XLA cache,
                # so the real first step below reuses it. Skipped under
                # batch_size=auto: the batch probe already maxed out memory
                # against the safe "full" rung.
                #
                # On RESUME, reuse the run's recorded rung instead of
                # re-probing: probing against a device already holding the
                # restored checkpoint inflates the apparent peak (a fresh
                # launch of the 224² flagship probes block as fitting; its
                # own resume probed block as over-budget and fell back to
                # full) — re-probing makes the rung load-order dependent AND
                # costs several AOT compiles per restart.
                from medvae_tpu.train.autoremat import (
                    recorded_remat_decision,
                    resolve_auto_remat,
                )

                chosen, drop_cache = (
                    recorded_remat_decision(ckpt_dir_early)
                    if cfg.get("resume") or cfg.get("resume_from")
                    else (None, False)
                )
                if chosen is not None:
                    print(
                        f"remat=auto: resuming with recorded rung "
                        f"{chosen!r} (device_cache_dropped={drop_cache}, "
                        f"trainer_state.json)"
                    )
                    self._drop_device_cache = drop_cache
                    model = build_model(
                        cfg["model"],
                        precision=cfg.get("precision", "bf16"),
                        use_pallas=bool(cfg.get("use_pallas", True)),
                        remat=chosen,
                    )
                else:
                    chosen, model, drop_cache = resolve_auto_remat(
                        make_model=lambda r: build_model(
                            cfg["model"],
                            precision=cfg.get("precision", "bf16"),
                            use_pallas=bool(cfg.get("use_pallas", True)),
                            remat=r,
                        ),
                        step_kwargs={
                            k: v
                            for k, v in self._step_kwargs.items()
                            if k != "model"
                        },
                        state=self.state,
                        datamodule=self.datamodule,
                        mesh=self.mesh,
                        seed_key=self.seed_key,
                        reserve_bytes=self._projected_cache_bytes(),
                        droppable_reserve=True,
                    )
                    # the rung was chosen on the premise that the dataset
                    # cache is (or is not) pinned next to it — honor it
                    self._drop_device_cache = drop_cache
                self._resolved_remat = chosen
                if chosen != "full":  # pre-probe build is the "full" rung
                    self.model = model
                    self._step_kwargs["model"] = model
            self.train_step = build_train_step(**self._step_kwargs)
        self._eval_kwargs = dict(
            model=self.model,
            loss_cfg=self.loss_cfg,
            mesh=self.mesh,
            normalize=bool(self.datamodule.normalize),
            max_channels=self.datamodule.max_channels,
            disc=disc,
        )
        self.eval_step = build_eval_step(**self._eval_kwargs)
        self._eval_runners: Dict[str, Any] = {}

        # bookkeeping -----------------------------------------------------------
        ckpt_cfg = cfg.get("checkpointing", {}) or {}
        ckpt_dir = os.path.join(
            cfg.get("checkpoint_dir", "logs/checkpoints"),
            cfg.get("experiment_name", "run"),
        )
        self.ckpt = CheckpointManager(
            ckpt_dir,
            save_top_k=int(ckpt_cfg.get("save_top_k", 3)),
            monitor=ckpt_cfg.get("monitor", "val/loss"),
            mode=ckpt_cfg.get("mode", "min"),
            save_last=bool(ckpt_cfg.get("save_last", True)),
        )
        # persist the composed config next to the checkpoints so generate/
        # evaluate/analyze can rebuild the model without the original CLI
        import yaml

        with open(os.path.join(ckpt_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(
                cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg), f
            )

        es_cfg = cfg.get("early_stopping", {}) or {}
        self.early_stopping = (
            EarlyStopping(
                patience=int(es_cfg.get("patience", 20)),
                mode=es_cfg.get("mode", "min"),
                monitor=es_cfg.get("monitor", "val/loss"),
            )
            if es_cfg.get("enabled", False)
            else None
        )
        self.logger = MetricLogger(
            cfg.get("log_dir", "logs"),
            cfg.get("experiment_name", "run"),
            config=cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg),
            wandb_cfg=cfg.get("wandb"),
        )
        self.rng = jax.random.fold_in(self.seed_key, 0xBEEF)
        if cfg.get("debug", {}).get("nan_checks"):
            jax.config.update("jax_debug_nans", True)

        # resume: restore train state (params, optimizer, step, disc, EMA)
        # from a checkpoint — `resume=true` picks up this experiment's `last`,
        # `resume_from=<path>` restores an explicit checkpoint directory.
        resume_from = cfg.get("resume_from")
        if cfg.get("resume") and not resume_from:
            resume_from = "last"
        if resume_from:
            target = (
                resume_from
                if os.path.isabs(str(resume_from))
                else os.path.join(ckpt_dir, str(resume_from))
            )
            if os.path.isdir(target):
                host_state = jax.device_get(self.state)
                self.state = replicate(
                    self.mesh, self.ckpt.restore(host_state, target)
                )
                self._load_monitor_state()
                print(f"Resumed from {target} at step {int(self.state.step)}")
            else:
                print(f"resume requested but no checkpoint at {target}; fresh start")

        # Persist the remat=auto decision NOW, not first at validation time:
        # a preemption before the first validation would otherwise leave no
        # trainer_state.json and force the restarted run to re-probe (the
        # exact load-order-dependent probe the recording exists to avoid).
        # On resume this rewrites the just-loaded monitor values unchanged.
        if self._resolved_remat is not None:
            self._save_monitor_state()

    # -- host-side monitor state (plateau / early-stop counters) ---------- #
    # The device TrainState carries lr_scale, but the plateau best/patience
    # counters and EarlyStopping best/counter live on host; persisting them
    # beside the checkpoints keeps monitoring behavior identical across a
    # preemption+resume, completing the exact-resume story.

    def _validate_geometry(self) -> None:
        """Fail fast, with a clear message, when the encoder/decoder chain
        cannot reproduce the input spatial size. The asymmetric-pad stride-2
        downsampling floors odd sizes (28 -> 14 -> 7 -> 3) while upsampling
        doubles (3 -> 24), so e.g. a resolution-224 model (3 downsamples, as
        in the reference's multi_modal_cvae experiment: conditional_vae.yaml
        resolution 224 over size-28 multi_modal data) silently emits 24x24
        reconstructions against 28x28 targets and crashes mid-epoch deep in
        the loss. Shape inference only — no FLOPs, no compile."""
        size, c = self.datamodule.size, self.datamodule.max_channels
        x = jax.ShapeDtypeStruct((2, size, size, c), self.model.dtype)

        def fwd(v, x):
            if isinstance(self.model, DisentangledConditionalVAE):
                out = self.model.apply(
                    v, x, jnp.zeros((2,), jnp.int32),
                    rngs={"sample": jax.random.PRNGKey(0)},
                )
            elif isinstance(self.model, ConditionalVAE):
                cond = jnp.zeros((2, self.model.cond_dim), self.model.dtype)
                out = self.model.apply(
                    v, x, cond, rngs={"sample": jax.random.PRNGKey(0)}
                )
            else:
                out = self.model.apply(
                    v, x, rngs={"sample": jax.random.PRNGKey(0)}
                )
            return out["reconstruction"]

        rec = jax.eval_shape(fwd, self.variables, x).shape
        if rec[1:3] != (size, size):
            n_down = len(tuple(self.model.ch_mult)) - 1
            raise ValueError(
                f"model/data geometry mismatch: {size}x{size} inputs come out "
                f"of the decoder as {rec[1]}x{rec[2]} reconstructions "
                f"({n_down} stride-2 downsamples floor odd sizes; upsampling "
                f"doubles). Use a ch_mult with fewer levels (e.g. [1,2,4] for "
                f"28x28) or a data.size divisible by 2^{n_down} (e.g. 224). "
                f"The reference's multi_modal_cvae experiment ships this "
                f"mismatch (resolution-224 model over size-28 data) and "
                f"crashes the same way."
            )

    def _save_monitor_state(self) -> None:
        import json

        blob: Dict[str, Any] = {}
        if self._plateau is not None:
            blob["plateau"] = {
                "best": self._plateau["best"], "count": self._plateau["count"]
            }
        if self.early_stopping is not None:
            blob["early_stopping"] = {
                "best": self.early_stopping.best,
                "counter": self.early_stopping.counter,
            }
        if self._resolved_remat is not None:
            # False | "block" | "full" — reused verbatim on resume instead of
            # re-probing (train/autoremat.py:recorded_remat_rung)
            blob["remat_rung"] = self._resolved_remat
            blob["device_cache_dropped"] = bool(
                getattr(self, "_drop_device_cache", False)
            )
        if blob:
            path = os.path.join(self.ckpt.directory, "trainer_state.json")
            with open(path, "w") as f:
                json.dump(blob, f)

    def _load_monitor_state(self) -> None:
        import json

        path = os.path.join(self.ckpt.directory, "trainer_state.json")
        if not os.path.exists(path):
            return
        with open(path) as f:
            blob = json.load(f)
        p = blob.get("plateau")
        if p and self._plateau is not None:
            self._plateau["best"] = p.get("best")
            self._plateau["count"] = int(p.get("count", 0))
        es = blob.get("early_stopping")
        if es and self.early_stopping is not None:
            self.early_stopping.best = es.get("best")
            self.early_stopping.counter = int(es.get("counter", 0))

    # ------------------------------------------------------------------ #

    def _feeder(self, split: str, shuffle: bool, drop_last: bool):
        """Feeder per (split, shuffle, drop_last), memoized so a device cache
        is pinned once per run, not re-transferred every validation epoch.

        data.device_cache: "auto" (default — cache a split on device when its
        uint8 arrays fit MEDVAE_DEVICE_CACHE_BUDGET bytes, default 2 GiB),
        "true" (force), or "false" (always stream from host). Through
        transports where host→device copies serialize against compute, the
        cached path keeps training at device-step speed (pipeline.py:
        DeviceCachedFeeder docstring has the measurements)."""
        key = (split, shuffle, drop_last)
        cached = self._feeders.get(key)
        if cached is not None:
            return cached
        arrays = self.datamodule.split(split)
        seed = int(self.cfg.get("seed", 42))
        # data.stratify_batches: modality-stratified training batches so the
        # batch-global separation/contrastive losses see every modality each
        # step (default on for the disentangled experiment configs)
        stratify = shuffle and bool(
            (self.cfg.get("data") or {}).get("stratify_batches", False)
        )
        feeder = None
        if self._device_cache_wanted(arrays):
            from medvae_tpu.data.pipeline import DeviceCachedFeeder

            try:
                feeder = DeviceCachedFeeder(
                    arrays, self.datamodule.batch_size, self.mesh,
                    shuffle=shuffle, drop_last=drop_last, seed=seed,
                    stratify=stratify,
                )
            except Exception as e:  # OOM etc. — stream from host instead
                print(f"device_cache unavailable ({e}); streaming from host")
        if feeder is None:
            feeder = DeviceFeeder(
                arrays, self.datamodule.batch_size, self.mesh,
                shuffle=shuffle, drop_last=drop_last, seed=seed,
                stratify=stratify,
            )
        self._feeders[key] = feeder
        return feeder

    def _device_cache_wanted(self, arrays) -> bool:
        """Would this split be pinned on device? (data.device_cache knob +
        HBM budget; single-process only.)"""
        mode = str(
            (self.cfg.get("data") or {}).get("device_cache", "auto")
        ).lower()
        if mode not in ("auto", "true", "1") or jax.process_count() > 1:
            return False
        # remat=auto resolved its rung on the premise that the cache HBM is
        # free for activations (train/autoremat.py:choose_remat) — stream
        if getattr(self, "_drop_device_cache", False):
            return False
        from medvae_tpu.data.pipeline import split_cache_nbytes

        budget = int(os.environ.get("MEDVAE_DEVICE_CACHE_BUDGET", 2 << 30))
        return mode != "auto" or split_cache_nbytes(arrays) <= budget

    def _projected_cache_bytes(self) -> int:
        """Total bytes the run's device caches will pin (train+val+test) —
        the auto-batch probe holds this as ballast so the chosen batch size
        still fits once the caches land."""
        from medvae_tpu.data.pipeline import split_cache_nbytes

        total = 0
        for split in ("train", "val", "test"):
            try:
                arrays = self.datamodule.split(split)
            except Exception:
                continue
            if self._device_cache_wanted(arrays):
                total += split_cache_nbytes(arrays)
        return total

    def _eval_runner(self, split: str, feeder):
        """Fused whole-split evaluator (one dispatch per validate call) when
        the split is device-cached; None -> per-batch loop."""
        if split in self._eval_runners:
            return self._eval_runners[split]
        from medvae_tpu.data.pipeline import DeviceCachedFeeder

        runner = None
        tcfg = self.cfg.get("training") or {}
        fused_mode = str(tcfg.get("fused_steps", "auto")).lower()
        # auto: fuse only when the eval dispatches saved over the run's
        # expected validate calls amortize the one-time chunk compile
        validates = (
            int(tcfg.get("max_epochs", 1))
            // max(1, int(tcfg.get("check_val_every_n_epoch", 1)))
            + 2
        )
        worthwhile = (
            feeder.steps_per_epoch * validates >= FUSED_AUTO_MIN_STEPS
        )
        if (
            fused_mode in ("on", "true", "1")
            or (fused_mode == "auto" and worthwhile)
        ) and isinstance(feeder, DeviceCachedFeeder):
            from medvae_tpu.train.multistep import build_eval_chunk_runner
            from medvae_tpu.train.step import build_eval_step as _bes

            raw = _bes(**self._eval_kwargs, raw=True)
            runner = build_eval_chunk_runner(raw, feeder)
        self._eval_runners[split] = runner
        return runner

    def _dispatch_caps(self) -> tuple:
        """(max_inflight_steps, fused_chunk_max) — the tunneled-worker crash
        guards, defaulting on at high resolution. One definition so the
        train loop (fit) and the whole-split eval scan (validate) can never
        drift apart: queueing ~100 224² dispatches, or scanning ~100 steps
        in one dispatch, reproducibly crashed the tunneled TPU worker; both
        paths must stay bounded by the same knobs (training.max_inflight_steps
        throttles the per-step loop with a one-scalar fence,
        training.fused_chunk_max cuts fused scans into ≤K-step dispatches;
        0 disables either)."""
        tcfg = self.cfg.get("training") or {}
        hi = self.datamodule.size >= 112
        throttle = int(tcfg.get("max_inflight_steps", 8 if hi else 0) or 0)
        chunk = int(tcfg.get("fused_chunk_max", 16 if hi else 0) or 0)
        return throttle, chunk

    def validate(self, split: str = "val") -> Dict[str, float]:
        from medvae_tpu.data.medmnist import MODALITY_NAMES

        feeder = self._feeder(split, shuffle=False, drop_last=False)
        runner = self._eval_runner(split, feeder)
        zmod_sum = None
        if runner is not None:
            # same worker-crash guard as training (_dispatch_caps): cut the
            # whole-split scan (e.g. 160 eval steps of the 224² forward) into
            # <=cap-step sub-dispatches and fetch each before issuing the
            # next. Identical math — the per-step stacked metrics are
            # concatenated across sub-scans.
            _, cap = self._dispatch_caps()
            total = feeder.steps_per_epoch
            step_sz = cap if 0 < cap < total else total
            parts = []
            for s0 in range(0, total, step_sz):
                part = runner(
                    self.state, 0, min(step_sz, total - s0), self.rng,
                    start=s0,
                )
                parts.append(part)
            stacked = {
                k: np.concatenate([np.asarray(p[k]) for p in parts])
                for k in parts[0]
            }
            w = np.asarray(stacked.pop("val/_weight"), np.float64)
            psnr_by_mod = np.asarray(
                stacked.pop("val/_psnr_by_mod")
            ).sum(axis=0)
            count_by_mod = np.asarray(
                stacked.pop("val/_count_by_mod")
            ).sum(axis=0)
            zs = stacked.pop("val/_zmod_sum_by_mod", None)
            if zs is not None:
                zmod_sum = np.asarray(zs, np.float64).sum(axis=0)
            weight_total = float(w.sum())
            acc = {
                k: float(np.sum(np.asarray(v, np.float64) * w))
                for k, v in stacked.items()
            }
        else:
            acc = {}
            weight_total = 0.0
            psnr_by_mod = count_by_mod = None  # sized from the step's output
            for batch in feeder.epoch(0):
                # one device_get per batch (per-key fetches pay one round
                # trip each)
                m = jax.device_get(self.eval_step(self.state, batch, self.rng))
                w = float(m.pop("val/_weight"))
                p_mod = np.asarray(m.pop("val/_psnr_by_mod"))
                c_mod = np.asarray(m.pop("val/_count_by_mod"))
                zs = m.pop("val/_zmod_sum_by_mod", None)
                if psnr_by_mod is None:
                    psnr_by_mod = np.zeros_like(p_mod)
                    count_by_mod = np.zeros_like(c_mod)
                if zs is not None:
                    zs = np.asarray(zs, np.float64)
                    zmod_sum = zs if zmod_sum is None else zmod_sum + zs
                psnr_by_mod += p_mod
                count_by_mod += c_mod
                weight_total += w
                for k, v in m.items():
                    acc[k] = acc.get(k, 0.0) + float(v) * w
        out = {k: v / max(weight_total, 1.0) for k, v in acc.items()}
        if zmod_sum is not None:
            # exact whole-split modality-centroid separation (the research
            # memo's headline metric; per-batch separation degenerates to 0
            # on the modality-contiguous val ordering)
            present = count_by_mod > 0
            if int(present.sum()) >= 2:
                cents = zmod_sum[present] / count_by_mod[present, None]
                d = np.sqrt(
                    ((cents[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                )
                iu = np.triu_indices(len(cents), 1)
                out["val/centroid_distance"] = float(d[iu].mean())
        # per-modality PSNR for modalities present in the split
        for mod in range(0 if psnr_by_mod is None else len(psnr_by_mod)):
            if count_by_mod[mod] > 0:
                name = (MODALITY_NAMES[mod] if mod < len(MODALITY_NAMES)
                        else f"mod{mod}")
                out[f"val/psnr_{name}"] = float(
                    psnr_by_mod[mod] / count_by_mod[mod]
                )
        if split != "val":
            out = {k.replace("val/", f"{split}/", 1): v for k, v in out.items()}
        return out

    def fit(self) -> Dict[str, float]:
        tcfg = self.cfg["training"]
        max_epochs = int(tcfg.get("max_epochs", 10))
        log_every = int(tcfg.get("log_every_n_steps", 50))
        # Worker-crash guards (see _dispatch_caps): throttle_every bounds the
        # per-step loop's dispatch queue with a one-scalar fence every K
        # steps (negligible next to a >100 ms step); fused_chunk_max cuts
        # fused lax.scan chunks to ≤K steps per dispatch for one extra
        # chunk-size compile. 224² full-flagship runs died inside the first
        # log interval without these; small/fast configs default both off.
        throttle_every, fused_chunk_max = self._dispatch_caps()
        val_interval = float(tcfg.get("val_check_interval", 1.0))
        check_every = int(tcfg.get("check_val_every_n_epoch", 1))
        profile = bool(self.cfg.get("debug", {}).get("profile", False))

        limit_train = int(tcfg.get("limit_train_batches", 0)) or None
        # recon/sample grids every N epochs (reference logs media every 10
        # epochs, lightning_module.py:479-552); 0 disables
        media_every = int(tcfg.get("log_images_every_n_epochs", 10) or 0)

        feeder = self._feeder("train", shuffle=True, drop_last=True)
        self._warn_if_synthetic()
        last_val: Dict[str, float] = {}
        t_start = time.time()
        images_seen = 0
        first_timed = False
        mid_val_at = (
            int(self.steps_per_epoch * val_interval) if 0 < val_interval < 1 else None
        )
        # periodic within-epoch `last` refresh (preemption tolerance);
        # 0 = epoch-boundary checkpoints only (the reference's cadence)
        ckpt_every = int(
            (self.cfg.get("checkpointing") or {}).get("every_n_steps", 0) or 0
        )

        # exact resume: continue at the restored optimizer step. Feeders are
        # deterministic per (seed, epoch), so skipping the already-consumed
        # batches of the partial epoch replays the exact remaining stream —
        # a preempted run resumed from `last` sees the same data order it
        # would have seen uninterrupted.
        eff_steps = (
            min(self.steps_per_epoch, limit_train)
            if limit_train
            else self.steps_per_epoch
        )
        start_step = int(jax.device_get(self.state.step))
        start_epoch, skip_batches = divmod(start_step, eff_steps)
        if start_step:
            print(
                f"Resuming at optimizer step {start_step} -> epoch "
                f"{start_epoch}, skipping {skip_batches} consumed batches"
            )

        # fused multi-step execution (training.fused_steps: auto|off): when
        # the train split is device-cached and the default jit step is in use,
        # run chunks of steps inside one lax.scan per dispatch — removes the
        # per-step host round trip (train/multistep.py has the measurements).
        # Same batches/rng/updates as the per-step loop, equal up to XLA
        # reassociation (tests/test_multistep.py).
        fused_runner = None
        fused_plan = None
        from medvae_tpu.data.pipeline import DeviceCachedFeeder

        fused_mode = str(tcfg.get("fused_steps", "auto")).lower()
        # "auto" fuses only when the run is long enough to amortize the extra
        # chunk-executable compiles (each distinct chunk size is one XLA
        # compile — minutes through a remote-compile tunnel, so a 5-epoch
        # 16-step quick run would LOSE time fusing while a 640-step/epoch run
        # gains 11x); "on" forces fusion, "off" disables.
        planned = eff_steps * max(0, max_epochs - start_epoch)
        if (
            (
                fused_mode in ("on", "true", "1")
                or (fused_mode == "auto" and planned >= FUSED_AUTO_MIN_STEPS)
            )
            and isinstance(feeder, DeviceCachedFeeder)
            and getattr(self, "_step_kwargs", None) is not None
            and self._state_sharding is None  # TP keeps explicit shardings
            and not profile
        ):
            from medvae_tpu.train.multistep import build_chunk_runner, chunk_plan

            raw = build_train_step(**self._step_kwargs, raw=True)
            fused_runner = build_chunk_runner(raw, feeder)
            fused_plan = chunk_plan
        self._fused_active = fused_runner is not None

        if profile:
            jax.profiler.start_trace(os.path.join(self.logger.dir, "profile"))

        try:
            for epoch in range(start_epoch, max_epochs):
                epoch_t0 = time.time()

                def log_train(step, metrics, epoch=epoch):
                    nonlocal first_timed, t_start, images_seen
                    if not first_timed:
                        # exclude the first step's compile time from throughput
                        first_timed = True
                        t_start = time.time()
                        images_seen = 0
                    if step % log_every == 0:
                        # ONE device_get for the whole dict: per-key fetches
                        # are one host<->device round trip EACH — ~20 scalars
                        # x tunnel RTT dominated entire epochs before compute
                        host = {
                            k: float(v)
                            for k, v in jax.device_get(metrics).items()
                        }
                        host["train/images_per_sec"] = images_seen / (
                            time.time() - t_start
                        )
                        host["epoch"] = epoch
                        self.logger.log(host, step)
                        print(
                            f"epoch {epoch} step {step} "
                            f"loss {host.get('train/loss', host.get('train/total_loss', float('nan'))):.4f} "
                            f"({host['train/images_per_sec']:.0f} img/s)"
                        )

                if fused_runner is not None:
                    # fused multi-step: K steps per dispatch via lax.scan with
                    # in-graph batch assembly; chunk boundaries land on every
                    # log/checkpoint cadence so host actions are unchanged
                    eff = (
                        min(self.steps_per_epoch, limit_train)
                        if limit_train
                        else self.steps_per_epoch
                    )
                    g_base = epoch * self.steps_per_epoch
                    s0 = skip_batches if epoch == start_epoch else 0
                    extra = (g_base + mid_val_at,) if mid_val_at else ()
                    for g0, nst in fused_plan(
                        g_base + eff, g_base + s0, log_every, ckpt_every,
                        fused_chunk_max, extra=extra,
                    ):
                        self.state, metrics = fused_runner(
                            self.state, epoch, g0 - g_base, nst, self.rng
                        )
                        images_seen += nst * self.datamodule.batch_size
                        step = g0 + nst
                        if throttle_every:
                            # same worker-crash guard as the per-step loop:
                            # one scalar fence per dispatch keeps at most one
                            # large fused program in flight
                            jax.device_get(next(iter(metrics.values())))
                        log_train(step, metrics)
                        if ckpt_every and step % ckpt_every == 0:
                            self.ckpt.save_step(self.state)
                        if mid_val_at and step - g_base == mid_val_at:
                            last_val = self.validate()
                            self.logger.log(last_val, step)
                else:
                    for i, batch in enumerate(feeder.epoch(epoch)):
                        if limit_train and i >= limit_train:
                            break
                        if epoch == start_epoch and i < skip_batches:
                            continue
                        self.state, metrics = self.train_step(
                            self.state, batch, self.rng
                        )
                        images_seen += self.datamodule.batch_size
                        step = epoch * self.steps_per_epoch + i + 1
                        if throttle_every and step % throttle_every == 0:
                            # Bound in-flight dispatches: between log syncs up
                            # to log_every async steps queue on the device;
                            # for large programs (224² remat graphs through
                            # the tunneled backend) a deep queue crashes the
                            # TPU worker process. Fetching one scalar VALUE is
                            # the reliable fence here (block_until_ready can
                            # acknowledge early through tunnels).
                            jax.device_get(next(iter(metrics.values())))
                        log_train(step, metrics)
                        if profile and step >= min(20, self.steps_per_epoch):
                            jax.profiler.stop_trace()
                            profile = False
                        if ckpt_every and step % ckpt_every == 0:
                            self.ckpt.save_step(self.state)  # refresh `last`
                        if mid_val_at and (i + 1) == mid_val_at:
                            last_val = self.validate()
                            self.logger.log(last_val, step)

                # media cadence is independent of the validation cadence:
                # check_val_every_n_epoch=5 with log_images_every_n_epochs=10
                # must still produce grids (epoch%10==0 never aligns with the
                # (epoch+1)%5 validation epochs)
                if media_every and epoch % media_every == 0:
                    self._log_media(epoch, (epoch + 1) * self.steps_per_epoch)

                if (epoch + 1) % check_every == 0:
                    last_val = self.validate()
                    self._check_monitors(last_val)
                    step = (epoch + 1) * self.steps_per_epoch
                    last_val["epoch_time_sec"] = time.time() - epoch_t0
                    self.logger.log(last_val, step)
                    print(
                        f"epoch {epoch} val/loss "
                        f"{last_val.get('val/loss', float('nan')):.4f} "
                        f"psnr {last_val.get('val/psnr', float('nan')):.2f}"
                    )
                    self.ckpt.save_step(self.state, last_val)
                    self._maybe_reduce_lr(last_val)
                    stop = bool(
                        self.early_stopping and self.early_stopping.update(last_val)
                    )
                    self._save_monitor_state()
                    if stop:
                        print(f"Early stopping at epoch {epoch}")
                        break
        finally:
            if profile:  # trace still open (run shorter than the stop point)
                jax.profiler.stop_trace()
            self.ckpt.wait()
            self.logger.close()

        final = self.ckpt.save_final(
            self.state, self.cfg.get("experiment_name", "run")
        )
        self.ckpt.wait()  # drain the async write before interpreter teardown
        print(f"Final checkpoint: {final}")
        return last_val

    def _warn_if_synthetic(self) -> None:
        banner_fn = getattr(self.datamodule, "synthetic_banner", None)
        banner = banner_fn("training") if banner_fn else None
        if banner:
            print(banner)

    def _log_media(self, epoch: int, step: int) -> None:
        """Render reconstruction + prior-sample grids into
        <run_dir>/media/epoch_XXXX_*.png (and W&B when enabled) — parity with
        the reference's in-training image logging
        (lightning_module.py:479-552)."""
        from medvae_tpu.train.step import make_forward_fn, preprocess
        from medvae_tpu.utils.visualization import (
            plot_reconstructions,
            plot_samples,
            to_unit,
        )

        media_dir = os.path.join(self.logger.dir, "media")
        os.makedirs(media_dir, exist_ok=True)

        if getattr(self, "_media_fn", None) is None:
            forward = make_forward_fn(self.model)

            def run(state, b, rng):
                x = preprocess(
                    b, None, augment=False,
                    normalize=bool(self.datamodule.normalize),
                    max_channels=self.datamodule.max_channels,
                    dtype=getattr(self.model, "dtype", jnp.float32),
                )
                out = forward(
                    state.params, x, b, {"sample": rng}, deterministic=True
                )
                return x, out["reconstruction"]

            self._media_fn = jax.jit(run)

            n = 16
            if isinstance(self.model, DisentangledConditionalVAE):
                midx = jnp.asarray(
                    np.arange(n) % self.model.num_modalities, jnp.int32
                )
                self._sample_fn = jax.jit(
                    lambda p, k: self.model.apply(
                        {"params": p}, n, midx, k,
                        method=self.model.sample_conditional,
                    )
                )
            else:
                # ConditionalVAE's decoder is unconditional (reference TODO),
                # so the plain prior sample covers it too
                self._sample_fn = jax.jit(
                    lambda p, k: self.model.apply(
                        {"params": p}, n, k, method=self.model.sample
                    )
                )

        feeder = self._feeder("val", shuffle=False, drop_last=False)
        batch = next(iter(feeder.epoch(0)))
        x, recon = jax.device_get(self._media_fn(self.state, batch, self.rng))
        samples = jax.device_get(
            self._sample_fn(self.state.params, jax.random.fold_in(self.rng, epoch))
        )

        recon_path = os.path.join(media_dir, f"epoch_{epoch:04d}_recon.png")
        sample_path = os.path.join(media_dir, f"epoch_{epoch:04d}_samples.png")
        plot_reconstructions(
            to_unit(np.asarray(x[:8], np.float32)),
            to_unit(np.asarray(recon[:8], np.float32)),
            save_path=recon_path,
        )
        plot_samples(
            to_unit(np.asarray(samples, np.float32)),
            save_path=sample_path,
            title=f"Prior samples — epoch {epoch}",
        )
        self.logger.log_images(
            {"media/reconstructions": recon_path, "media/samples": sample_path},
            step,
        )

    def _check_monitors(self, val_metrics: Dict[str, float]) -> None:
        """Fail fast on a monitor key the eval step never emits — a
        misconfigured monitor must be an error, not a silent no-op (the
        reference would silently never checkpoint/stop)."""
        if self._monitors_checked:
            return
        self._monitors_checked = True
        wanted = {"checkpointing.monitor": self.ckpt.monitor}
        if self.early_stopping is not None:
            wanted["early_stopping.monitor"] = self.early_stopping.monitor
        if self._plateau is not None:
            wanted["scheduler.monitor (plateau)"] = self._plateau["monitor"]
        missing = {n: k for n, k in wanted.items() if k not in val_metrics}
        if missing:
            raise ValueError(
                f"Monitored metric(s) not produced by validation: {missing}. "
                f"Available keys: {sorted(val_metrics)}"
            )

    def _maybe_reduce_lr(self, val_metrics: Dict[str, float]) -> None:
        if self._plateau is None:
            return
        value = val_metrics.get(self._plateau["monitor"])
        if value is None:
            return
        p = self._plateau
        if p["best"] is None or value < p["best"] - 1e-8:
            p["best"] = value
            p["count"] = 0
            return
        p["count"] += 1
        if p["count"] >= p["patience"]:
            p["count"] = 0
            new_scale = self.state.lr_scale * p["factor"]
            self.state = self.state.replace(lr_scale=new_scale)
            print(f"ReduceLROnPlateau: lr_scale -> {float(new_scale):.2e}")

    def test(self) -> Dict[str, float]:
        self.datamodule.setup("test")
        return self.validate("test")
