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
    # full 32-sample forwards (no microbatching): the batch-global
    # separation/contrastive losses need the whole batch in one forward
    assert cfg.training.accumulate_grad_batches == 1
    assert cfg.data.batch_size == 32
    assert cfg.data.size == 224
    assert cfg.data.stratify_batches is True


def test_instantiate_compat_targets(config_dir):
    cfg = compose(config_dir, overrides=["experiment=chest_base_vae_quick"])
    # Reference-style target string should also resolve
    cfg.model._target_ = "src.models.BaseVAE"
    model = instantiate(cfg.model)
    assert type(model).__name__ == "BaseVAE"


# ---------------------------------------------------------------------------
# Multirun sweep expansion (hydra `-m` grammar; config/sweep.py)
# ---------------------------------------------------------------------------


def test_sweep_comma_choice():
    from medvae_tpu.config.sweep import expand_multirun

    jobs, swept = expand_multirun(["training.lr=1e-3,1e-4", "seed=7"])
    assert swept == ["training.lr"]
    assert jobs == [
        ["training.lr=1e-3", "seed=7"],
        ["training.lr=1e-4", "seed=7"],
    ]


def test_sweep_brackets_and_escapes_are_not_choices():
    from medvae_tpu.config.sweep import expand_multirun, sweep_values

    # list values keep their commas; \, escapes a literal comma
    jobs, swept = expand_multirun(["model.ch_mult=[1,2,4]"])
    assert swept == [] and jobs == [["model.ch_mult=[1,2,4]"]]
    assert sweep_values(r"a\,b") == ["a,b"]
    assert sweep_values("'a,b'") == ["'a,b'"]


def test_sweep_choice_and_range():
    from medvae_tpu.config.sweep import sweep_values

    assert sweep_values("choice(adam, adamw)") == ["adam", "adamw"]
    assert sweep_values("range(1,4)") == ["1", "2", "3"]
    assert sweep_values("range(4)") == ["0", "1", "2", "3"]
    assert sweep_values("range(0,0.3,0.1)") == ["0.0", "0.1", "0.2"]
    assert sweep_values("range(3,0,-1)") == ["3", "2", "1"]


def test_sweep_cartesian_product_order():
    from medvae_tpu.config.sweep import expand_multirun, job_label

    jobs, swept = expand_multirun(["a=1,2", "+b=x,y"])
    assert swept == ["a", "b"]
    # last key iterates fastest (hydra/basic-sweeper order)
    assert [job_label(j, swept) for j in jobs] == [
        "a=1,b=x", "a=1,b=y", "a=2,b=x", "a=2,b=y",
    ]
    assert jobs[1] == ["a=1", "+b=y"]


def test_sweep_group_select_sweeps_and_composes(config_dir):
    from medvae_tpu.config.sweep import expand_multirun

    jobs, swept = expand_multirun(["model=base_vae_quick,beta_vae_quick"])
    assert swept == ["model"]
    names = [
        compose(config_dir, overrides=j).model._target_.rsplit(".", 1)[-1]
        for j in jobs
    ]
    assert names == ["BaseVAE", "BetaVAE"]


def test_sweep_no_sweeps_single_job():
    from medvae_tpu.config.sweep import expand_multirun

    jobs, swept = expand_multirun(["experiment=chest_base_vae_quick"])
    assert len(jobs) == 1 and swept == []


def test_exponent_notation_parses_as_float(config_dir):
    """pyyaml reads `1e-3` as a string (YAML 1.1); OmegaConf — the reference's
    loader — reads a float. Both CLI overrides and YAML file values must mean
    the float (configs/training/default.yaml ships `lr: 1e-4`)."""
    cfg = compose(config_dir, overrides=["training.optimizer.lr=1e-3"])
    assert cfg.training.optimizer.lr == 0.001
    # file values too (training/default.yaml: weight_decay: 1e-4)
    assert cfg.training.optimizer.weight_decay == 1e-4
    # quoted/lettered strings stay strings; plain floats unaffected
    cfg2 = compose(config_dir, overrides=["+a.s=e1", "+a.f=2.5", "+a.n=1E+2"])
    assert cfg2.a.s == "e1" and cfg2.a.f == 2.5 and cfg2.a.n == 100.0
    # explicitly quoted exponent-shaped values stay strings (OmegaConf rule:
    # only plain scalars are auto-typed) — both on the CLI and in files
    cfg3 = compose(config_dir, overrides=['+a.tag="1e5"'])
    assert cfg3.a.tag == "1e5"
    import tempfile, os as _os
    from medvae_tpu.config.compose import load_yaml
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "x.yaml")
        with open(p, "w") as f:
            f.write('plain: 1e-4\nquoted: "1e5"\n')
        loaded = load_yaml(p)
        assert loaded.plain == 1e-4 and loaded.quoted == "1e5"
