"""scripts/summarize_run.py digests a metrics.jsonl (pure stdlib, no JAX)."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from summarize_run import find_metrics, summarize  # noqa: E402


def write_jsonl(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_summarize_trajectory_and_resume_detection(tmp_path):
    d = tmp_path / "logs" / "exp"
    d.mkdir(parents=True)
    rows = [
        {"train/loss": 0.5, "train/images_per_sec": 10.0, "step": 5},
        {"val/loss": 0.4, "val/psnr": 18.0, "val/ssim": 0.3, "step": 8},
        {"train/loss": 0.3, "train/images_per_sec": 100.0, "step": 10},
        # crash + resume from the step-8 checkpoint: steps regress
        {"train/loss": 0.31, "train/images_per_sec": 98.0, "step": 10},
        {"val/loss": 0.2, "val/psnr": 22.0, "val/ssim": 0.5,
         "epoch_time_sec": 30.0, "step": 16},
        {"val/loss": 0.25, "val/psnr": 21.0, "val/ssim": 0.45,
         "epoch_time_sec": 31.0, "step": 24},
    ]
    write_jsonl(d / "metrics.jsonl", rows)

    s = summarize(find_metrics(str(tmp_path)))
    assert s["train"]["first_step"] == 5 and s["train"]["last_step"] == 10
    assert s["train"]["last_loss"] == 0.31
    # steady-state median drops the first (compile-tainted) rate:
    # median over [100, 98] (upper of two) — 10.0 excluded
    assert s["train"]["images_per_sec_median"] == 100.0
    assert s["resumes_detected"] == 1
    # best psnr is step 16, not the last row
    assert s["val"]["best_psnr"] == 22.0 and s["val"]["best_psnr_step"] == 16
    assert s["val"]["last"]["val/psnr"] == 21.0
    assert s["val"]["psnr_trajectory"] == [(8, 18.0), (16, 22.0), (24, 21.0)]
    assert s["epochs_completed"] == 2
    assert s["epoch_time_sec_median"] == 31.0


def test_find_metrics_accepts_file_dir_and_workdir(tmp_path):
    d = tmp_path / "logs" / "exp"
    d.mkdir(parents=True)
    f = d / "metrics.jsonl"
    write_jsonl(f, [{"train/loss": 1.0, "step": 1}])
    assert find_metrics(str(f)) == str(f)
    assert find_metrics(str(d)) == str(f)
    assert find_metrics(str(tmp_path)) == str(f)
