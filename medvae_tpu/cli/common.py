"""Shared CLI helpers: checkpoint loading + model reconstruction."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp
import yaml

from medvae_tpu.train.trainer import build_model


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Restore a raw train-state pytree from an orbax checkpoint directory."""
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"checkpoint not found: {path}")
    return ocp.StandardCheckpointer().restore(path)


def find_run_config(ckpt_path: str, explicit: Optional[str] = None) -> Dict[str, Any]:
    """Locate the composed run config (saved next to the checkpoints)."""
    candidates = [explicit] if explicit else []
    d = os.path.abspath(ckpt_path)
    for up in range(4):
        candidates.append(os.path.join(d, "config.yaml"))
        d = os.path.dirname(d)
    for c in candidates:
        if c and os.path.exists(c):
            with open(c) as f:
                return yaml.safe_load(f)
    raise FileNotFoundError(
        f"No config.yaml found near {ckpt_path}; pass --config explicitly"
    )


def load_model_and_params(
    ckpt_path: str, config_path: Optional[str] = None, use_ema: bool = False
) -> Tuple[Any, Dict, Dict[str, Any]]:
    """`use_ema`: return the EMA weight average instead of the raw params
    when the checkpoint carries one (training.ema_decay > 0) — the usual
    deployment/eval choice. Errors loudly if the run kept no EMA."""
    cfg = find_run_config(ckpt_path, config_path)
    model = build_model(
        cfg["model"], precision=cfg.get("precision", "bf16"),
        use_pallas=bool(cfg.get("use_pallas", True)),
    )
    state = load_checkpoint(ckpt_path)
    params = state["params"] if "params" in state else state
    if use_ema:
        ema = state.get("ema_params") if isinstance(state, dict) else None
        if ema is None:
            raise ValueError(
                f"use_ema requested but checkpoint {ckpt_path} has no "
                "ema_params (train with training.ema_decay > 0)"
            )
        params = ema
    return model, params, cfg
