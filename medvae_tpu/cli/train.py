"""`train` entry point.

Parity: reference main.py:17-120 (`uv run train experiment=... key=value ...`).
Hydra-style composition via medvae_tpu.config (same config tree, same override
syntax), then the Trainer loop: seed → model → datamodule → fit → test → final
checkpoint. Run artifacts (composed config, overrides) are captured per run as
the reference's .hydra/ directory does.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import yaml

from medvae_tpu.config import compose


def default_config_dir() -> str:
    env = os.environ.get("MEDVAE_CONFIG_DIR")
    if env:
        return env
    here = Path(__file__).resolve()
    for parent in here.parents:
        cand = parent / "configs"
        if (cand / "config.yaml").exists():
            return str(cand)
    return "configs"


def _capture_run_dir(cfg, overrides) -> None:
    run_dir = os.path.join(
        cfg.get("log_dir", "logs"), cfg.get("experiment_name", "run")
    )
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, default_flow_style=False)
    with open(os.path.join(run_dir, "overrides.yaml"), "w") as f:
        yaml.safe_dump(list(overrides), f)


def apply_device_config(cfg) -> None:
    """Honor cfg.device: 'cpu' pins jax to the host backend (useful for smoke
    runs); 'tpu'/'cuda' keep the environment's default accelerator backend."""
    device = str(cfg.get("device", "tpu")).lower()
    if device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> int:
    overrides = list(sys.argv[1:] if argv is None else argv)
    cfg = compose(default_config_dir(), "config", overrides)
    _capture_run_dir(cfg, overrides)
    apply_device_config(cfg)

    from medvae_tpu.train.trainer import Trainer

    print(f"Experiment: {cfg.get('experiment_name')}")
    trainer = Trainer(cfg)
    val = trainer.fit()
    test = trainer.test()
    print("Validation:", {k: round(v, 5) for k, v in val.items()})
    print("Test:", {k: round(v, 5) for k, v in test.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
