"""End-to-end multirun sweep: `train -m` expands swept overrides into
sequential jobs with isolated run dirs and a sweep summary — the reference's
hydra multirun surface (reference main.py:17 + hydra basic sweeper)."""

import json
import os

from medvae_tpu.cli import train


def test_multirun_two_jobs(tmp_path):
    rc = train.main([
        "-m",
        "experiment=chest_base_vae_quick",
        f"work_dir={tmp_path}",
        "device=cpu",
        "training.max_epochs=1",
        "+training.limit_train_batches=2",
        "early_stopping.enabled=false",
        "data.batch_size=32",
        "model.hidden_channels=8",
        "model.ch_mult=[1,2]",
        # swept key: same shapes both jobs, so the jit cache is shared
        "training.optimizer.lr=1e-3,2e-3",
    ])
    assert rc == 0

    sweep_root = tmp_path / "logs" / "multirun"
    stamps = list(sweep_root.iterdir())
    assert len(stamps) == 1
    sweep_dir = stamps[0]

    summary = json.loads((sweep_dir / "summary.json").read_text())
    assert [r["job"] for r in summary] == [0, 1]
    assert all(r["status"] == "ok" for r in summary)
    assert summary[0]["label"] == "training.optimizer.lr=1e-3"
    assert summary[1]["label"] == "training.optimizer.lr=2e-3"
    for r in summary:
        assert "val/loss" in r["val"] and r["val"]["val/loss"] == r["val"]["val/loss"]

    # per-job isolation: each job has its own checkpoints + captured config,
    # and the captured config records the job's swept value
    for num, lr in ((0, 0.001), (1, 0.002)):
        job_dir = sweep_dir / str(num)
        ckpt = job_dir / "checkpoints" / "chest_base_vae_quick"
        assert (ckpt / "last").exists(), f"job {num} checkpoint missing"
        import yaml

        cfg = yaml.safe_load((ckpt / "config.yaml").read_text())
        assert cfg["training"]["optimizer"]["lr"] == lr
        assert cfg["checkpoint_dir"].startswith(str(job_dir))
