#!/usr/bin/env python
"""Summarize a training run directory from its metrics.jsonl.

Digests what a long run actually did — throughput, loss/PSNR trajectory,
best/last validation metrics, epoch times, gaps in the step sequence
(crashes + resumes) — without loading JAX or the checkpoint. Pure stdlib.

Usage:
    python scripts/summarize_run.py <work_dir | metrics.jsonl> [--json]

<work_dir> may be the run's work_dir (searches logs/*/metrics.jsonl), the
experiment log dir, or the metrics.jsonl itself.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def find_metrics(path: str) -> str:
    if os.path.isfile(path):
        return path
    for pattern in ("metrics.jsonl", "logs/*/metrics.jsonl", "*/metrics.jsonl"):
        hits = sorted(glob.glob(os.path.join(path, pattern)))
        if hits:
            if len(hits) > 1:
                print(f"note: {len(hits)} runs under {path}; using {hits[-1]}",
                      file=sys.stderr)
            return hits[-1]
    raise FileNotFoundError(f"no metrics.jsonl under {path}")


def summarize(metrics_path: str) -> dict:
    train_rows, val_rows, epoch_times = [], [], []
    with open(metrics_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            if "train/loss" in row:
                train_rows.append(row)
            if "val/loss" in row:
                val_rows.append(row)
            if "epoch_time_sec" in row:
                epoch_times.append(float(row["epoch_time_sec"]))

    out: dict = {"metrics_file": metrics_path,
                 "train_points": len(train_rows), "val_points": len(val_rows)}
    if train_rows:
        rates = [r["train/images_per_sec"] for r in train_rows
                 if r.get("train/images_per_sec")]
        # steady-state throughput: drop the first point (includes compile)
        steady = rates[1:] or rates
        out["train"] = {
            "first_step": train_rows[0]["step"],
            "last_step": train_rows[-1]["step"],
            "first_loss": round(train_rows[0]["train/loss"], 5),
            "last_loss": round(train_rows[-1]["train/loss"], 5),
            "images_per_sec_median": round(sorted(steady)[len(steady) // 2], 1)
            if steady else None,
            "images_per_sec_max": round(max(rates), 1) if rates else None,
        }
        # a resumed run re-logs from the restored step: detect step regressions
        steps = [r["step"] for r in train_rows]
        out["resumes_detected"] = sum(
            1 for a, b in zip(steps, steps[1:]) if b <= a
        )
    if val_rows:
        def fnum(v):
            return round(float(v), 5)

        best_psnr = max(val_rows, key=lambda r: r.get("val/psnr", -1e9))
        last = val_rows[-1]
        out["val"] = {
            "last_step": last.get("step"),
            "last": {k: fnum(v) for k, v in last.items()
                     if k.startswith("val/") and isinstance(v, (int, float))},
            "best_psnr": fnum(best_psnr.get("val/psnr", float("nan"))),
            "best_psnr_step": best_psnr.get("step"),
        }
        traj = [(r.get("step"), round(r.get("val/psnr", float("nan")), 2))
                for r in val_rows]
        out["val"]["psnr_trajectory"] = traj[-12:]
    if epoch_times:
        out["epochs_completed"] = len(epoch_times)
        out["epoch_time_sec_median"] = round(
            sorted(epoch_times)[len(epoch_times) // 2], 1
        )
    return out


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("path")
    p.add_argument("--json", action="store_true", help="machine-readable dump")
    args = p.parse_args()
    s = summarize(find_metrics(args.path))
    if args.json:
        print(json.dumps(s))
        return 0
    print(f"run: {s['metrics_file']}")
    if "train" in s:
        t = s["train"]
        print(
            f"train: steps {t['first_step']}..{t['last_step']}, "
            f"loss {t['first_loss']} -> {t['last_loss']}, "
            f"{t['images_per_sec_median']} img/s median "
            f"(max {t['images_per_sec_max']})"
        )
        if s.get("resumes_detected"):
            print(f"resumes detected: {s['resumes_detected']} (step regressions)")
    if "val" in s:
        v = s["val"]
        print(f"val@{v['last_step']}: " + ", ".join(
            f"{k.split('/', 1)[1]}={v['last'][k]}"
            for k in ("val/loss", "val/psnr", "val/ssim")
            if k in v["last"]
        ))
        extras = [k for k in v["last"]
                  if k in ("val/centroid_distance", "val/silhouette")]
        if extras:
            print("separation: " + ", ".join(
                f"{k.split('/', 1)[1]}={v['last'][k]}" for k in extras))
        print(f"best psnr: {v['best_psnr']} @ step {v['best_psnr_step']}")
        print("psnr trajectory:",
              " ".join(f"{st}:{ps}" for st, ps in v["psnr_trajectory"]))
    if "epochs_completed" in s:
        print(
            f"epochs: {s['epochs_completed']} "
            f"(median {s['epoch_time_sec_median']}s)"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
