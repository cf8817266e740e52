"""Checkpointing: orbax async train-state snapshots with best-k tracking.

Parity target: Lightning ModelCheckpoint keyed on val/loss with save_top_k,
save_last, plus the explicit `<experiment>_final` save (reference main.py:51-61,
111-116, configs/config.yaml:36-40). Orbax writes happen asynchronously so the
TPU never waits on the filesystem.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        save_top_k: int = 3,
        monitor: str = "val/loss",
        mode: str = "min",
        save_last: bool = True,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_top_k = save_top_k
        self.monitor = monitor
        self.mode = mode
        self.save_last = save_last
        self._ckptr = ocp.StandardCheckpointer()
        self._best: List[Dict[str, Any]] = []  # [{"step", "metric", "path"}]
        self._index_path = os.path.join(self.directory, "index.json")
        self._load_index()

    # -- index persistence ---------------------------------------------------

    def _load_index(self):
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._best = json.load(f).get("best", [])

    def _write_index(self):
        with open(self._index_path, "w") as f:
            json.dump({"best": self._best, "monitor": self.monitor}, f, indent=2)

    # -- save / restore --------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _save(self, state, name: str):
        path = self._path(name)
        # async saves to the same name must drain before the overwrite
        self._ckptr.wait_until_finished()
        if os.path.exists(path):
            shutil.rmtree(path)
        self._ckptr.save(path, state)

    def save_step(
        self, state, metrics: Optional[Dict[str, float]] = None
    ) -> Optional[str]:
        """Save if the monitored metric ranks in the top-k; always refresh last."""
        step = int(jax.device_get(state.step))
        saved = None
        metric = None if metrics is None else metrics.get(self.monitor)
        if metric is not None:
            metric = float(metric)
            better = (lambda a, b: a < b) if self.mode == "min" else (lambda a, b: a > b)
            if len(self._best) < self.save_top_k or better(
                metric, self._best[-1]["metric"]
            ):
                # loss-stamped names (the reference embeds val loss in
                # checkpoint filenames, e.g. `...loss=0.036.ckpt`)
                name = f"step_{step:08d}_loss={metric:.4f}"
                self._save(state, name)
                self._best.append(
                    {"step": step, "metric": metric, "path": self._path(name)}
                )
                self._best.sort(
                    key=lambda e: e["metric"], reverse=(self.mode == "max")
                )
                while len(self._best) > self.save_top_k:
                    worst = self._best.pop()
                    if os.path.exists(worst["path"]):
                        shutil.rmtree(worst["path"])
                self._write_index()
                saved = self._path(name)
        if self.save_last:
            self._save(state, "last")
        return saved

    def save_final(self, state, experiment_name: str) -> str:
        name = f"{experiment_name}_final"
        self._save(state, name)
        return self._path(name)

    def best_path(self) -> Optional[str]:
        return self._best[0]["path"] if self._best else None

    def restore(self, state_template, name: str = "last"):
        """Restore into the template pytree (shapes/dtypes/shardings from it)."""
        path = name if os.path.isabs(name) else self._path(name)
        return self._ckptr.restore(path, target=state_template)

    def wait(self):
        self._ckptr.wait_until_finished()
