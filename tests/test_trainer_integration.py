"""End-to-end Trainer integration on the CPU backend: config → fit → test →
checkpoints, exercising the real wiring (feeder, steps, metrics, orbax, logs).
Uses a tiny model + limit_train_batches to stay fast."""

import os

import numpy as np

from medvae_tpu.config import compose
from medvae_tpu.train.trainer import Trainer


def test_trainer_end_to_end(tmp_path, config_dir):
    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "training.max_epochs=1",
            "+training.limit_train_batches=2",
            "training.log_every_n_steps=1",
            "early_stopping.enabled=false",
            "data.batch_size=64",
            # shrink the model for CI speed
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
        ],
    )
    trainer = Trainer(cfg)
    val = trainer.fit()
    assert np.isfinite(val["val/loss"])
    assert "val/psnr" in val and "val/ssim" in val

    test = trainer.test()
    assert np.isfinite(test["test/loss"])

    ckpt_root = os.path.join(str(tmp_path), "logs", "checkpoints",
                             "chest_base_vae_quick")
    assert os.path.isdir(os.path.join(ckpt_root, "last"))
    assert os.path.isdir(os.path.join(ckpt_root, "chest_base_vae_quick_final"))
    assert os.path.exists(os.path.join(ckpt_root, "config.yaml"))
    run_dir = os.path.join(str(tmp_path), "logs", "chest_base_vae_quick")
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "hparams.yaml"))
