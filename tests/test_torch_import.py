"""Checkpoint migration: a reference Lightning `.ckpt` imported via
`medvae_tpu.compat` must reproduce the torch model's numerics.

Uses the reference's own torch models (read-only oracle at /root/reference)
to fabricate Lightning-style checkpoints, runs the real import CLI, then
compares encode/decode outputs elementwise. Skipped without torch or the
reference checkout."""

import os
import sys

import numpy as np
import pytest

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "src")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from medvae_tpu.cli import import_ckpt  # noqa: E402
from medvae_tpu.cli.common import load_model_and_params  # noqa: E402


TINY = dict(
    hidden_channels=16,
    ch_mult=[1, 2],
    num_res_blocks=1,
    attn_resolutions=[],
    dropout=0.0,
    resolution=16,
)


def _save_lightning_ckpt(tmodel, path):
    state = {f"model.{k}": v for k, v in tmodel.state_dict().items()}
    # Lightning checkpoints also carry non-model bookkeeping; the importer
    # must skip it rather than choke.
    state["loss.perceptual_loss.dummy"] = torch.zeros(1)
    torch.save({"state_dict": state, "epoch": 7, "global_step": 123}, path)


def _run_import(tmp_path, ckpt, experiment, overrides):
    out = str(tmp_path / "imported_run")
    rc = import_ckpt.main(
        ["--ckpt", str(ckpt), "--experiment", experiment, "--output_dir", out]
        + [a for o in overrides for a in ("--override", o)]
    )
    assert rc == 0
    return os.path.join(out, "imported")


def test_import_disentangled_checkpoint(tmp_path):
    from src.models.disentangled_conditional_vae import (
        DisentangledConditionalVAE as TModel,
    )

    torch.manual_seed(0)
    tmodel = TModel(
        num_modalities=5, shared_latent_dim=4, modality_latent_dim=4, **TINY
    ).eval()
    ckpt = tmp_path / "ref.ckpt"
    _save_lightning_ckpt(tmodel, ckpt)

    path = _run_import(
        tmp_path,
        ckpt,
        "disentangled_multi_modal_cvae_quick",
        [
            "precision=fp32",
            "model.hidden_channels=16",
            "model.ch_mult=[1,2]",
            "model.num_res_blocks=1",
            "model.attn_resolutions=[]",
            "model.resolution=16",
            "model.shared_latent_dim=4",
            "model.modality_latent_dim=4",
            "data.size=16",
        ],
    )
    model, params, _ = load_model_and_params(path)
    variables = {"params": params}

    rng = np.random.RandomState(1)
    x = rng.rand(5, 16, 16, 3).astype(np.float32)
    midx = np.arange(5, dtype=np.int32)

    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(midx),
        )
    jmu, jlogvar = model.apply(
        variables, jnp.asarray(x), jnp.asarray(midx), method=model.encode
    )
    np.testing.assert_allclose(
        np.asarray(jmu),
        np.transpose(tmu.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jlogvar),
        np.transpose(tlogvar.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
    )

    # decode covers the base decoder, the grouped modality heads, and the
    # per-modality output projectors
    with torch.no_grad():
        trec = tmodel.decode(tmu, torch.from_numpy(midx))
    jrec = model.apply(
        variables, jmu, jnp.asarray(midx), method=model.decode
    )
    np.testing.assert_allclose(
        np.asarray(jrec),
        np.transpose(trec.numpy(), (0, 2, 3, 1)),
        atol=5e-4,
    )


def test_import_conditional_checkpoint(tmp_path):
    from src.models.conditional_vae import ConditionalVAE as TModel

    torch.manual_seed(0)
    tmodel = TModel(
        condition_method="concat",
        condition_dim=5,
        latent_dim=4,
        input_channels=3,
        **TINY,
    ).eval()
    ckpt = tmp_path / "ref_cvae.ckpt"
    _save_lightning_ckpt(tmodel, ckpt)

    path = _run_import(
        tmp_path,
        ckpt,
        "multi_modal_cvae_quick",
        [
            "precision=fp32",
            "model.hidden_channels=16",
            "model.ch_mult=[1,2]",
            "model.num_res_blocks=1",
            "model.attn_resolutions=[]",
            "model.resolution=16",
            "model.latent_dim=4",
            "model.dropout=0.0",
            "model.condition_dim=5",
            "data.size=16",
        ],
    )
    model, params, _ = load_model_and_params(path)
    variables = {"params": params}

    rng = np.random.RandomState(2)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    cond = np.zeros((2, tmodel.condition_dim), np.float32)
    cond[0, 1] = 1.0
    cond[1, 3] = 1.0

    with torch.no_grad():
        tmu, tlogvar = tmodel.encode(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(cond),
        )
    jmu, jlogvar = model.apply(
        variables, jnp.asarray(x), jnp.asarray(cond), method=model.encode
    )
    np.testing.assert_allclose(
        np.asarray(jmu), np.transpose(tmu.numpy(), (0, 2, 3, 1)), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(jlogvar),
        np.transpose(tlogvar.numpy(), (0, 2, 3, 1)),
        atol=2e-4,
    )
