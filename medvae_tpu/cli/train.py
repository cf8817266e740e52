"""`train` entry point.

Parity: reference main.py:17-120 (`uv run train experiment=... key=value ...`).
Hydra-style composition via medvae_tpu.config (same config tree, same override
syntax), then the Trainer loop: seed → model → datamodule → fit → test → final
checkpoint. Run artifacts (composed config, overrides) are captured per run as
the reference's .hydra/ directory does.

Multirun sweeps (`train -m key=a,b other=range(1,4)`) expand the cartesian
product of swept overrides into sequential jobs, each in its own
``<log_dir>/multirun/<stamp>/<job>`` directory (Hydra's ``-m`` surface,
reference pyproject.toml entry `train` + hydra multirun mode). A sweep
summary (per-job overrides + final val/test metrics) is printed and written
to ``summary.json`` in the sweep directory.
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


def _run_one(overrides) -> tuple:
    """Compose + train once; returns (val_metrics, test_metrics)."""
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
    return val, test


def run_multirun(overrides) -> int:
    """Hydra `-m` mode: expand sweeps, run jobs sequentially, summarize."""
    import gc
    import time

    from medvae_tpu.config.sweep import expand_multirun, job_label

    jobs, swept_keys = expand_multirun(overrides)
    stamp = time.strftime("%Y-%m-%d_%H-%M-%S")
    print(f"Multirun: {len(jobs)} job(s), sweeping {swept_keys or '(nothing)'}")

    # two-pass compose: discover the base log_dir ONCE (from job 0, so a
    # swept work_dir/log_dir still yields a single sweep directory holding
    # every job + the summary), then redirect each job's log_dir — and
    # everything interpolated from it, e.g. checkpoint_dir — into its own
    # subdirectory: hydra's multirun/<stamp>/<jobnum> layout.
    base_log = compose(default_config_dir(), "config", jobs[0]).get(
        "log_dir", "logs"
    )
    sweep_dir = os.path.join(str(base_log), "multirun", stamp)
    results = []
    try:
        for num, job in enumerate(jobs):
            job_overrides = job + [
                f"log_dir={os.path.join(sweep_dir, str(num))}"
            ]
            label = job_label(job, swept_keys)
            print(f"\n=== job {num}/{len(jobs) - 1}: {label or '(fixed)'} ===")
            entry = {"job": num, "overrides": job, "label": label}
            results.append(entry)
            t0 = time.time()
            try:
                val, test = _run_one(job_overrides)
                entry.update(
                    status="ok",
                    val={k: float(v) for k, v in val.items()},
                    test={k: float(v) for k, v in test.items()},
                )
            except Exception as e:  # noqa: BLE001 — recorded, then re-raised
                entry.update(status="error", error=f"{type(e).__name__}: {e}")
                raise
            finally:
                entry["seconds"] = round(time.time() - t0, 1)
                gc.collect()  # drop the job's device buffers before the next
    finally:
        _write_sweep_summary(sweep_dir, results)
    monitor = "val/loss"
    print(f"\nMultirun summary ({len(results)} jobs) -> {sweep_dir}")
    for r in results:
        v = (r.get("val") or {}).get(monitor)
        shown = f"{monitor}={v:.5f}" if v is not None else r["status"]
        print(f"  [{r['job']}] {r['label'] or '(fixed)'}: {shown}")
    return 0


def _write_sweep_summary(sweep_dir, results) -> None:
    import json

    if not sweep_dir:
        return
    os.makedirs(sweep_dir, exist_ok=True)
    with open(os.path.join(sweep_dir, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)


def main(argv=None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    multirun = any(a in ("-m", "--multirun") for a in args)
    overrides = [a for a in args if a not in ("-m", "--multirun")]
    if multirun:
        return run_multirun(overrides)
    _run_one(overrides)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
