"""End-to-end Trainer integration on the CPU backend: config → fit → test →
checkpoints, exercising the real wiring (feeder, steps, metrics, orbax, logs).
Uses a tiny model + limit_train_batches to stay fast."""

import os

import numpy as np

from medvae_tpu.config import compose
from medvae_tpu.train.trainer import Trainer
import pytest

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow


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
    # in-training media logging (reference logs grids every 10 epochs; epoch 0
    # matches `epoch % 10 == 0`)
    media = os.path.join(run_dir, "media")
    assert os.path.exists(os.path.join(media, "epoch_0000_recon.png"))
    assert os.path.exists(os.path.join(media, "epoch_0000_samples.png"))


def _resume_cfg(tmp_path, config_dir, max_epochs, extra=()):
    return compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            f"training.max_epochs={max_epochs}",
            "training.log_every_n_steps=100",
            "+training.log_images_every_n_epochs=0",
            "early_stopping.enabled=false",
            "data.batch_size=128",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
            *extra,
        ],
    )


def test_resume_is_exact(tmp_path, config_dir):
    """A run interrupted at an epoch boundary and resumed from `last` must
    produce bitwise-identical parameters to the uninterrupted run: the fit
    loop continues at state.step (same epochs, same deterministic shuffles,
    same step-folded rngs) instead of replaying data from epoch 0."""
    import jax

    # uninterrupted: 2 epochs
    t_full = Trainer(_resume_cfg(tmp_path / "full", config_dir, 2))
    t_full.fit()
    p_full = jax.device_get(t_full.state.params)
    assert int(jax.device_get(t_full.state.step)) == 2 * t_full.steps_per_epoch

    # interrupted: 1 epoch, then resume to 2
    t_a = Trainer(_resume_cfg(tmp_path / "split", config_dir, 1))
    t_a.fit()
    t_b = Trainer(
        _resume_cfg(tmp_path / "split", config_dir, 2, extra=["resume=true"])
    )
    assert int(jax.device_get(t_b.state.step)) == t_b.steps_per_epoch
    t_b.fit()
    p_split = jax.device_get(t_b.state.params)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p_full, p_split
    )


def test_resume_restores_monitor_state(tmp_path, config_dir):
    """Plateau and EarlyStopping counters live on host; resume must restore
    them from trainer_state.json so monitoring behavior (patience windows,
    best-so-far) continues instead of resetting after preemption."""
    extra = [
        "training.scheduler.type=plateau",
        "+training.scheduler.patience=50",
        "early_stopping.enabled=true",
        "early_stopping.patience=50",
    ]
    t1 = Trainer(_resume_cfg(tmp_path, config_dir, 1, extra=extra))
    t1.fit()
    assert t1.early_stopping.best is not None
    assert t1._plateau["best"] is not None
    assert os.path.exists(
        os.path.join(t1.ckpt.directory, "trainer_state.json")
    )

    t2 = Trainer(
        _resume_cfg(tmp_path, config_dir, 2, extra=extra + ["resume=true"])
    )
    assert t2.early_stopping.best == t1.early_stopping.best
    assert t2.early_stopping.counter == t1.early_stopping.counter
    assert t2._plateau["best"] == t1._plateau["best"]
    assert t2._plateau["count"] == t1._plateau["count"]


def test_resume_mid_epoch_skips_consumed_batches(tmp_path, config_dir):
    """Mid-epoch resume fast-forwards the deterministic feeder: a state
    restored at step k of an epoch trains exactly steps_per_epoch - k more
    steps to finish it, and checkpointing.every_n_steps refreshes `last`
    within the epoch so such states exist after preemption."""
    import jax

    cfg = _resume_cfg(
        tmp_path, config_dir, 1, extra=["+checkpointing.every_n_steps=3"]
    )
    t = Trainer(cfg)
    spe = t.steps_per_epoch
    assert spe >= 4
    # simulate a preempted run restored mid-epoch (preserve dtype/placement)
    t.state = t.state.replace(step=t.state.step * 0 + 3)
    t.fit()
    assert int(jax.device_get(t.state.step)) == spe  # 3 skipped, spe-3 run
    ckpt_root = os.path.join(
        str(tmp_path), "logs", "checkpoints", "chest_base_vae_quick"
    )
    assert os.path.isdir(os.path.join(ckpt_root, "last"))


def test_disentangled_validate_reports_global_centroid(tmp_path, config_dir):
    """validate() must report the whole-split modality-centroid distance for
    the disentangled model (the research memo's headline metric — per-batch
    separation degenerates to 0 on the modality-contiguous val ordering),
    identically from the fused and per-batch eval paths."""
    from medvae_tpu.config import compose

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=disentangled_multi_modal_cvae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "training.max_epochs=1",
            "early_stopping.enabled=false",
            "data.batch_size=64",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "+training.fused_steps=on",
        ],
    )
    t = Trainer(cfg)
    fused = t.validate()
    assert t._eval_runners.get("val") is not None
    assert fused.get("val/centroid_distance", 0.0) > 0.0
    # degenerate per-batch terms stay (reference-faithful), global metric adds
    assert "val/separation_loss" in fused
    t._eval_runners["val"] = None  # per-batch loop must agree
    loop = t.validate()
    np.testing.assert_allclose(
        fused["val/centroid_distance"], loop["val/centroid_distance"],
        rtol=1e-5,
    )


def test_media_logging_independent_of_val_cadence(tmp_path, config_dir):
    """Media grids must follow their own epoch cadence even when it never
    aligns with check_val_every_n_epoch (regression: the media call used to
    live inside the validation block, so val-every-2 + images-every-3 would
    only ever evaluate epochs 1 and 3 against `epoch % 3 == 0`)."""
    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            "device=cpu",
            f"work_dir={tmp_path}",
            "training.max_epochs=4",
            "+training.limit_train_batches=1",
            "+training.check_val_every_n_epoch=2",
            "+training.log_images_every_n_epochs=3",
            "early_stopping.enabled=false",
            "data.batch_size=32",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
        ],
    )
    Trainer(cfg).fit()
    media = os.path.join(
        str(tmp_path), "logs", "chest_base_vae_quick", "media"
    )
    for epoch in (0, 3):  # epochs where epoch % 3 == 0
        assert os.path.exists(
            os.path.join(media, f"epoch_{epoch:04d}_recon.png")
        ), f"missing media for epoch {epoch}"
        assert os.path.exists(
            os.path.join(media, f"epoch_{epoch:04d}_samples.png")
        )


def test_trainer_gan_multidevice_end_to_end(tmp_path, config_dir):
    """ConditionalVAE + LPIPS/PatchGAN loss at 64x64 through the full Trainer
    on the 8-device mesh with the explicit shard_map GAN step — the
    configs/training/advanced.yaml path (VERDICT r1 item 4)."""
    cfg = compose(
        config_dir,
        overrides=[
            "model=conditional_vae_quick",
            "data=multi_modal_quick",
            "training=advanced",
            f"work_dir={tmp_path}",
            "device=cpu",
            "experiment_name=gan_e2e",
            "training.max_epochs=1",
            "+training.limit_train_batches=2",
            "training.log_every_n_steps=1",
            "training.loss.discriminator_iter_start=1",  # open the gate
            "early_stopping.enabled=false",
            "data.batch_size=16",
            "data.size=64",
            "model.resolution=64",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
            "model.dropout=0.0",
            "training.discriminator.ndf=8",
            "training.discriminator.n_layers=2",
            "+parallel.explicit_shard_map=true",
        ],
    )
    trainer = Trainer(cfg)
    val = trainer.fit()
    # GAN validation logs the generator objective + adversarial terms
    for key in ("val/loss", "val/p_loss", "val/g_loss", "val/d_loss"):
        assert key in val, key
    assert np.isfinite(val["val/loss"])
    assert val["val/p_loss"] > 0.0


def test_trainer_rejects_unknown_monitor(tmp_path, config_dir):
    """A monitor key validation never emits must fail fast, not silently
    no-op (VERDICT r1 item 9)."""
    import pytest

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "training.max_epochs=1",
            "+training.limit_train_batches=1",
            "early_stopping.enabled=true",
            "early_stopping.monitor=val/does_not_exist",
            "data.batch_size=64",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
        ],
    )
    trainer = Trainer(cfg)
    with pytest.raises(ValueError, match="does_not_exist"):
        trainer.fit()


def test_trainer_rejects_geometry_mismatch(tmp_path, config_dir):
    """A model whose downsample chain cannot reproduce the input size must
    fail at startup with a clear message, not crash mid-epoch deep in the
    loss. The reference's multi_modal_cvae experiment ships exactly this
    (resolution-224 model, 3 stride-2 downsamples, over size-28 data:
    28 -> 14 -> 7 -> 3 -> upsampled 24 vs 28 targets) and crashes the same
    way in torch. Shape-inference only (jax.eval_shape) — no compile."""
    import pytest

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2,4,8]",  # 3 downsamples over 28x28: broken
            "model.latent_dim=4",
        ],
    )
    with pytest.raises(ValueError, match="geometry mismatch"):
        Trainer(cfg)


def test_trainer_rejects_microbatched_disentangled(tmp_path, config_dir):
    """accumulate_grad_batches splits the batch (train/step.py), so the
    batch-global separation/contrastive losses would be computed on tiny
    microbatches — silently degenerate (no same-modality positives). The
    trainer must fail fast, and the explicit opt-in must lift the guard."""
    base = [
        "experiment=disentangled_multi_modal_cvae_quick",
        f"work_dir={tmp_path}",
        "device=cpu",
        "data.batch_size=32",
        "model.hidden_channels=8",
        "model.ch_mult=[1,2]",
        "training.accumulate_grad_batches=4",
    ]
    cfg = compose(config_dir, overrides=base)
    with pytest.raises(ValueError, match="microbatch"):
        Trainer(cfg)
    cfg_ok = compose(
        config_dir,
        overrides=base + ["+training.allow_microbatched_disentangled=true"],
    )
    Trainer(cfg_ok)  # opt-in constructs fine


def test_full_flagship_loss_terms(tmp_path, config_dir):
    """The full-flagship criterion (disentangled ELBO + LPIPS + BiomedCLIP
    feature terms, BASELINE configs item 4) trains finitely and logs both
    feature losses; dropping the weights removes the terms and the frozen
    nets. Tiny dims + 28² keep this fast (the 224² config shares the path)."""
    import numpy as np

    def make(extra):
        cfg = compose(
            config_dir,
            overrides=[
                "experiment=disentangled_multi_modal_cvae_quick",
                f"work_dir={tmp_path}",
                "device=cpu",
                "training.max_epochs=1",
                "+training.limit_train_batches=2",
                "early_stopping.enabled=false",
                "data.batch_size=8",
                "model.hidden_channels=8",
                "model.ch_mult=[1,2]",
                "model.shared_latent_dim=4",
                "model.modality_latent_dim=4",
                "model.latent_dim=8",
            ]
            + extra,
        )
        return Trainer(cfg)

    t = make(
        [
            "+training.loss.perceptual_weight=0.1",
            "+training.loss.biomedclip_weight=0.1",
            "+training.loss.clip_encoder=simple",
        ]
    )
    assert set(t.state.frozen) >= {"lpips", "clip"}
    val = t.fit()
    for key in ("val/loss", "val/p_loss", "val/bc_loss"):
        assert np.isfinite(val[key]), (key, val)

    plain = make([])
    assert "lpips" not in plain.state.frozen
    assert "clip" not in plain.state.frozen


def test_remat_decision_persisted_before_first_step(tmp_path, config_dir):
    """A preemption BEFORE the first validation must still find the
    remat=auto decision on disk (trainer_state.json is written at setup,
    not first at validation) — otherwise the restarted run re-probes, which
    is load-order dependent (train/autoremat.py:recorded_remat_decision).
    On CPU resolve_auto_remat short-circuits to the fallback rung, which
    still exercises the persistence path."""
    import json

    from medvae_tpu.train.autoremat import recorded_remat_decision

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "training.max_epochs=1",
            "+training.limit_train_batches=2",
            "early_stopping.enabled=false",
            "data.batch_size=64",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
            "+model.remat=auto",
        ],
    )
    Trainer(cfg)  # setup only — no fit(): simulates dying pre-validation
    ckpt_root = os.path.join(
        str(tmp_path), "logs", "checkpoints", "chest_base_vae_quick"
    )
    path = os.path.join(ckpt_root, "trainer_state.json")
    assert os.path.exists(path), "decision must be on disk before any step"
    blob = json.load(open(path))
    assert blob["remat_rung"] == "full"  # CPU short-circuit rung
    assert blob["device_cache_dropped"] is False
    assert recorded_remat_decision(ckpt_root) == ("full", False)
