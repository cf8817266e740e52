"""Config composition tests — the hydra-lite composer must reproduce the
reference's composition semantics (root defaults, @package _global_ group files,
experiment `override /group:` rewrites, CLI overrides, interpolation)."""

import os

from medvae_tpu.config import compose, instantiate


def test_root_defaults(config_dir):
    cfg = compose(config_dir)
    assert cfg.model._target_.endswith("BaseVAE")
    assert cfg.model.latent_dim == 128
    assert cfg.data.dataset_names == ["chestmnist"]
    assert cfg.training.optimizer.type == "adamw"
    assert cfg.seed == 42


def test_global_package_group_with_inheritance(config_dir):
    # base_vae_quick is @package _global_ and inherits model/base_vae
    cfg = compose(config_dir, overrides=["model=base_vae_quick"])
    assert cfg.model.latent_dim == 32
    assert cfg.model.hidden_channels == 32
    assert cfg.model.ch_mult == [1, 2, 4]
    assert cfg.model.resolution == 28
    # field only present in the parent file survives the merge
    assert cfg.model.attn_type == "vanilla"


def test_experiment_override_rewrites_groups(config_dir):
    cfg = compose(
        config_dir, overrides=["experiment=disentangled_multi_modal_cvae_quick"]
    )
    assert cfg.model._target_.endswith("DisentangledConditionalVAE")
    assert cfg.model.shared_latent_dim == 8
    assert cfg.model.num_modalities == 5
    assert cfg.training.loss.type == "disentangled_vae"
    assert cfg.training.max_epochs == 12
    assert cfg.training.optimizer.lr == 0.0005
    assert len(cfg.data.dataset_names) == 5
    assert cfg.data.batch_size == 32
    assert cfg.experiment_name == "disentangled_multi_modal_cvae_quick"


def test_cli_dot_overrides(config_dir):
    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            "training.max_epochs=2",
            "data.batch_size=16",
            "model.latent_dim=8",
        ],
    )
    assert cfg.training.max_epochs == 2
    assert cfg.data.batch_size == 16
    assert cfg.model.latent_dim == 8
    # experiment defaults that weren't overridden stay
    assert cfg.model.resolution == 28


def test_interpolation_env_and_refs(config_dir):
    cfg = compose(config_dir)
    pwd = os.environ.get("PWD", "")
    assert cfg.work_dir == pwd
    assert cfg.data_dir == f"{pwd}/data"
    assert cfg.checkpoint_dir.endswith("/logs/checkpoints")
    assert cfg.wandb.project == cfg.project_name


def test_quick_experiments_compose(config_dir):
    for exp in [
        "chest_base_vae",
        "chest_base_vae_quick",
        "chest_beta_vae_quick",
        "chest_conditional_vae_quick",
        "path_beta_vae",
        "multi_modal_cvae",
        "multi_modal_cvae_quick",
        "multi_modal_cvae_gan_quick",
        "disentangled_multi_modal_cvae_quick",
        "disentangled_multi_modal_cvae_full",
    ]:
        cfg = compose(config_dir, overrides=[f"experiment={exp}"])
        assert "_target_" in cfg.model, exp
        assert "loss" in cfg.training, exp


def test_full_flagship_experiment(config_dir):
    """BASELINE configs item 4: 224² disentangled CVAE, attention at multiple
    resolutions, LPIPS + BiomedCLIP feature terms, grad-accum."""
    from medvae_tpu.config import instantiate

    cfg = compose(
        config_dir, overrides=["experiment=disentangled_multi_modal_cvae_full"]
    )
    model = instantiate(cfg.model)
    assert type(model).__name__ == "DisentangledConditionalVAE"
    assert model.resolution == 224
    assert sorted(model.attn_resolutions) == [28, 56]
    assert model.shared_latent_dim == 64
    assert cfg.training.loss.type == "disentangled_vae"
    assert cfg.training.loss.perceptual_weight == 0.1
    assert cfg.training.loss.biomedclip_weight == 0.1
    assert cfg.training.accumulate_grad_batches == 4
    assert cfg.data.size == 224
    assert cfg.data.stratify_batches is True


def test_instantiate_compat_targets(config_dir):
    cfg = compose(config_dir, overrides=["experiment=chest_base_vae_quick"])
    # Reference-style target string should also resolve
    cfg.model._target_ = "src.models.BaseVAE"
    model = instantiate(cfg.model)
    assert type(model).__name__ == "BaseVAE"
