"""Optimizers and LR schedules via optax.

Parity targets:
  * configure_optimizers (reference src/lightning_module.py:390-450): Adam/AdamW
    with configurable lr/weight_decay/betas; the discriminator optimizer runs at
    lr·0.5 with betas (0.5, 0.999).
  * get_scheduler (reference src/utils/training_utils.py:12-57): step /
    multistep / exponential / cosine(T_max, eta_min) / plateau.

Schedules are per-step functions (optax-idiomatic); epoch-granular reference
schedules are expressed by passing steps_per_epoch. `plateau` uses
optax.contrib.reduce_on_plateau driven by the val metric from the trainer.

Gradient hygiene: global-norm clipping (Lightning gradient_clip_val,
reference main.py:91) and NaN-gradient suppression (the reference zeroes NaN
grads per-step, lightning_module.py:468-477 — here optax.zero_nans does it
inside the jitted update).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import optax


def build_schedule(
    scheduler_cfg: Optional[Dict[str, Any]],
    base_lr: float,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    if not scheduler_cfg:
        return optax.constant_schedule(base_lr)
    kind = str(scheduler_cfg.get("type", "constant")).lower()
    spe = max(1, steps_per_epoch)

    if kind == "constant":
        return optax.constant_schedule(base_lr)
    if kind == "step":
        step_size = int(scheduler_cfg.get("step_size", 10)) * spe
        gamma = float(scheduler_cfg.get("gamma", 0.1))
        return lambda count: base_lr * gamma ** (count // step_size)
    if kind == "multistep":
        milestones = [int(m) * spe for m in scheduler_cfg.get("milestones", [30, 80])]
        gamma = float(scheduler_cfg.get("gamma", 0.1))
        boundaries = {m: gamma for m in milestones}
        return optax.piecewise_constant_schedule(base_lr, boundaries)
    if kind == "exponential":
        gamma = float(scheduler_cfg.get("gamma", 0.95))
        return lambda count: base_lr * gamma ** (count // spe)
    if kind == "cosine":
        t_max = int(scheduler_cfg.get("T_max", 100)) * spe
        eta_min = float(scheduler_cfg.get("eta_min", 0.0))
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=max(1, t_max), alpha=eta_min / base_lr
        )
    if kind == "plateau":
        # plateau is metric-driven; the trainer composes reduce_on_plateau
        # separately. Base schedule stays constant.
        return optax.constant_schedule(base_lr)
    raise ValueError(f"Unknown scheduler type: {kind}")


def build_optimizer(
    optimizer_cfg: Dict[str, Any],
    scheduler_cfg: Optional[Dict[str, Any]] = None,
    steps_per_epoch: int = 1,
    gradient_clip_val: Optional[float] = 1.0,
    lr_scale: float = 1.0,
    betas_override: Optional[Tuple[float, float]] = None,
) -> optax.GradientTransformation:
    kind = str(optimizer_cfg.get("type", "adamw")).lower()
    lr = float(optimizer_cfg.get("lr", 1e-4)) * lr_scale
    wd = float(optimizer_cfg.get("weight_decay", 0.0))
    betas = betas_override or tuple(optimizer_cfg.get("betas", (0.9, 0.999)))
    eps = float(optimizer_cfg.get("eps", 1e-8))
    schedule = build_schedule(scheduler_cfg, lr, steps_per_epoch)

    # Adam epsilon placement, pinned explicitly: torch.optim.Adam{,W} computes
    # m̂/(√v̂ + ε); optax parameterizes m̂/(√(v̂ + ε_root) + ε). eps_root=0
    # makes the two identical update rules — verified over a 12-step training
    # trajectory against the torch reference in
    # tests/test_torch_parity.py::test_training_trajectory_parity.
    if kind == "adam":
        core = optax.adam(schedule, b1=betas[0], b2=betas[1], eps=eps, eps_root=0.0)
    elif kind == "adamw":
        core = optax.adamw(
            schedule, b1=betas[0], b2=betas[1], eps=eps, eps_root=0.0,
            weight_decay=wd,
        )
    elif kind == "sgd":
        core = optax.sgd(schedule, momentum=float(optimizer_cfg.get("momentum", 0.9)))
    else:
        raise ValueError(f"Unknown optimizer type: {kind}")

    chain = [optax.zero_nans()]
    if gradient_clip_val:
        chain.append(optax.clip_by_global_norm(float(gradient_clip_val)))
    chain.append(core)
    return optax.chain(*chain)


def discriminator_optimizer(
    optimizer_cfg: Dict[str, Any],
    scheduler_cfg: Optional[Dict[str, Any]] = None,
    steps_per_epoch: int = 1,
    gradient_clip_val: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """Disc optimizer: lr·0.5, betas (0.5, 0.999) (reference :430-438)."""
    return build_optimizer(
        optimizer_cfg,
        scheduler_cfg,
        steps_per_epoch,
        gradient_clip_val,
        lr_scale=0.5,
        betas_override=(0.5, 0.999),
    )
