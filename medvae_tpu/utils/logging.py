"""Metric logging.

Replaces Lightning's self.log / WandbLogger / TensorBoard fallback (reference
lightning_module.py:208-216, main.py:75-83): metrics stream to stdout, a JSONL
file, and a CSV per run; a hparams snapshot is written at startup (the
reference's hparams.yaml / .hydra capture). W&B attaches only if the package
exists and cfg.wandb.enabled (no hard dependency; this environment has no
egress).
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Any, Dict, Optional

import yaml


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str, config: Optional[dict] = None,
                 wandb_cfg: Optional[dict] = None):
        self.dir = os.path.join(log_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._csv_path = os.path.join(self.dir, "metrics.csv")
        self._csv_fields: list[str] = []
        if os.path.exists(self._csv_path):
            with open(self._csv_path) as f:
                reader = csv.reader(f)
                self._csv_fields = next(reader, []) or []
        self._t0 = time.time()
        self._wandb = None
        # tfevents sink — the reference's primary observability artifact
        # (lightning_logs/version_*/events.out.tfevents.*). Soft dependency:
        # silently skipped when no tensorboard writer is importable.
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(self.dir, "tb"))
        except Exception:
            pass

        if config is not None:
            with open(os.path.join(self.dir, "hparams.yaml"), "w") as f:
                yaml.safe_dump(config, f, default_flow_style=False)

        if wandb_cfg and wandb_cfg.get("enabled"):
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=wandb_cfg.get("project"),
                    name=wandb_cfg.get("name"),
                    tags=list(wandb_cfg.get("tags", [])),
                    config=config,
                )
            except Exception as e:  # pragma: no cover - no egress in CI
                print(f"[logger] wandb unavailable ({e}); falling back to files")

    def log(self, metrics: Dict[str, Any], step: int, prefix: str = "") -> None:
        row = {
            ("%s%s" % (prefix, k)): (float(v) if hasattr(v, "__float__") else v)
            for k, v in metrics.items()
        }
        row["step"] = step
        row["wall_time"] = round(time.time() - self._t0, 3)
        self._jsonl.write(json.dumps(row) + "\n")
        self._jsonl.flush()
        self._append_csv(row)
        if self._tb is not None:
            for k, v in row.items():
                if isinstance(v, (int, float)) and k not in ("step",):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(row, step=step)

    def _append_csv(self, row: Dict[str, Any]) -> None:
        new_fields = [k for k in row if k not in self._csv_fields]
        if new_fields:
            self._csv_fields += new_fields
            rows = []
            if os.path.exists(self._csv_path):
                with open(self._csv_path) as f:
                    rows = list(csv.DictReader(f))
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(
                    f, fieldnames=self._csv_fields, extrasaction="ignore"
                )
                w.writeheader()
                for r in rows:
                    w.writerow(r)
                w.writerow(row)
        else:
            with open(self._csv_path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._csv_fields).writerow(row)

    def log_images(self, images: Dict[str, str], step: int) -> None:
        """Log already-rendered image files (name -> path). Files live in the
        run dir regardless; W&B additionally gets them as media (the
        reference's every-10-epochs recon/sample grids,
        lightning_module.py:479-552)."""
        if self._wandb is None:
            return
        try:
            import wandb  # type: ignore

            self._wandb.log(
                {name: wandb.Image(path) for name, path in images.items()},
                step=step,
            )
        except Exception as e:  # pragma: no cover
            print(f"[logger] wandb image log failed ({e})")

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
