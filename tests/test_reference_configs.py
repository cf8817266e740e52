"""Drop-in config compatibility: the REFERENCE repo's own configs/ tree (read
only, /root/reference/configs) must compose with our hydra-lite composer and
instantiate medvae_tpu models/datamodules through the `src.*` target compat
map — a user can point the train CLI at their existing config tree unchanged.
Skipped when the reference checkout is absent."""

import os

import pytest

from medvae_tpu.config import compose, instantiate

REF_CFG = "/root/reference/configs"
if not os.path.isdir(REF_CFG):
    pytest.skip("reference configs unavailable", allow_module_level=True)


def test_reference_root_config_composes():
    cfg = compose(REF_CFG)
    assert cfg.model._target_ == "src.models.BaseVAE"
    assert cfg.model.latent_dim == 128
    assert cfg.data.dataset_names == ["chestmnist"]
    assert cfg.training.optimizer.type == "adamw"


@pytest.mark.parametrize(
    "exp",
    [
        "chest_base_vae",
        "chest_base_vae_quick",
        "chest_beta_vae_quick",
        "path_beta_vae",
        "multi_modal_cvae",
        "multi_modal_cvae_quick",
        "disentangled_multi_modal_cvae_quick",
    ],
)
def test_reference_experiments_compose_and_instantiate(exp):
    cfg = compose(REF_CFG, overrides=[f"experiment={exp}"])
    model = instantiate(cfg.model)
    assert model is not None
    # data module instantiates with the reference's extra keys swallowed
    data_cfg = dict(cfg.data)
    data_cfg["root"] = "/nonexistent"  # force synthetic fallback on setup
    data_cfg["synthetic_fallback"] = True
    dm = instantiate(data_cfg)
    assert dm.batch_size == cfg.data.batch_size


def test_reference_disentangled_experiment_values():
    cfg = compose(
        REF_CFG, overrides=["experiment=disentangled_multi_modal_cvae_quick"]
    )
    model = instantiate(cfg.model)
    assert type(model).__name__ == "DisentangledConditionalVAE"
    assert model.shared_latent_dim == 8
    assert model.num_modalities == 5
    assert cfg.training.loss.type == "disentangled_vae"
    assert len(cfg.data.dataset_names) == 5
