"""CLI regression tests: generate / evaluate / analyze against a tiny trained
checkpoint, exercising checkpoint restore, config auto-discovery, plotting and
artifact outputs in-process (no subprocess)."""

import json
import os

import numpy as np
import pytest

from medvae_tpu.config import compose
from medvae_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train the disentangled flagship for a few steps and return its ckpt dir."""
    work = tmp_path_factory.mktemp("cli_run")
    cfg = compose(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "configs"),
        overrides=[
            "experiment=disentangled_multi_modal_cvae_quick",
            f"work_dir={work}",
            "device=cpu",
            "training.max_epochs=1",
            "+training.limit_train_batches=2",
            "early_stopping.enabled=false",
            "data.batch_size=32",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
        ],
    )
    trainer = Trainer(cfg)
    trainer.fit()
    return os.path.join(
        str(work), "logs", "checkpoints", "disentangled_multi_modal_cvae_quick"
    )


def test_generate_cli(tiny_run, tmp_path):
    from medvae_tpu.cli import generate

    out = tmp_path / "gen"
    rc = generate.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--num_samples", "4", "--output_dir", str(out), "--per_modality",
        "--modality", "pathmnist",
    ])
    assert rc == 0
    assert (out / "samples_pathmnist.png").exists()


def test_generate_cli_interpolation(tiny_run, tmp_path):
    """--interpolate decodes prior-latent interpolation paths on device, one
    row per modality for the disentangled model (BASELINE configs item 5)."""
    from PIL import Image

    from medvae_tpu.cli import generate

    out = tmp_path / "interp"
    rc = generate.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--num_samples", "2", "--output_dir", str(out),
        "--modality", "pathmnist", "--interpolate", "6",
    ])
    assert rc == 0
    grid = np.asarray(Image.open(out / "interpolation_grid.png"))
    # 5 modality rows x 6 steps of 28x28 tiles (+2px padding)
    assert grid.shape[0] == 5 * 30 + 2 and grid.shape[1] == 6 * 30 + 2


def test_evaluate_cli(tiny_run, tmp_path):
    from medvae_tpu.cli import evaluate

    out = tmp_path / "eval"
    rc = evaluate.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--output_dir", str(out), "--max_batches", "1", "--split", "val",
        "--fid", "--mig",
    ])
    assert rc == 0
    with open(out / "metrics.json") as f:
        metrics = json.load(f)
    assert "psnr" in metrics and np.isfinite(metrics["psnr"]["mean"])
    assert np.isfinite(metrics["fid_recon"]["value"])
    assert np.isfinite(metrics["mig"]["value"])
    # per-modality PSNR breakdown: with --max_batches on the reference-
    # faithful modality-contiguous split only the leading modalities are
    # seen — at least one must be reported, each with finite mean + count
    by_mod = [k for k in metrics if k.startswith("psnr_")]
    assert by_mod, sorted(metrics)
    assert all(np.isfinite(metrics[k]["mean"]) for k in by_mod)
    assert all(metrics[k]["count"] > 0 for k in by_mod)
    assert (out / "reconstructions.png").exists()
    assert (out / "prior_samples.png").exists()


def test_analyze_cli_generated(tiny_run, tmp_path):
    from medvae_tpu.cli import analyze

    out = tmp_path / "analysis"
    rc = analyze.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--output_dir", str(out), "--generated",
        "--samples_per_modality", "20",
    ])
    assert rc == 0
    with open(out / "results.json") as f:
        results = json.load(f)
    assert np.isfinite(results["mean_centroid_distance"])
    assert (out / "latent_analysis.png").exists()
    assert (out / "latent_analysis.npz").exists()


def test_analyze_cli_encoded_reports_zmod_subspace(tiny_run, tmp_path):
    """Encode-path analyze on a disentangled model reports both full-latent
    and z_modality-subspace separation (the subspace the separation /
    contrastive losses act on)."""
    from medvae_tpu.cli import analyze

    out = tmp_path / "analysis_enc"
    rc = analyze.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--output_dir", str(out), "--samples_per_modality", "20",
    ])
    assert rc == 0
    with open(out / "results.json") as f:
        results = json.load(f)
    for k in ("mean_centroid_distance", "silhouette_score",
              "zmod_centroid_distance", "zmod_silhouette_score"):
        assert np.isfinite(results[k]), (k, results)


def test_reference_flag_compat(tiny_run, tmp_path):
    """The reference's exact argparse flags keep working: generate's
    --device/--grid_size (reference generate.py:109-126) and evaluate's
    --config_path/--num_samples/--device (reference evaluate.py:180-198)."""
    from medvae_tpu.cli import evaluate, generate

    out = tmp_path / "gen_compat"
    rc = generate.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--num_samples", "8", "--output_dir", str(out),
        "--device", "cpu", "--grid_size", "4",
    ])
    assert rc == 0 and (out / "samples_grid.png").exists()

    out2 = tmp_path / "eval_compat"
    rc = evaluate.main([
        "--model_path", os.path.join(tiny_run, "last"),
        "--config_path", os.path.join(tiny_run, "config.yaml"),
        "--num_samples", "32", "--device", "cpu",
        "--output_dir", str(out2),
    ])
    assert rc == 0 and (out2 / "metrics.json").exists()
