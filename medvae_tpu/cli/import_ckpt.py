"""`import-torch` entry point — migrate a reference Lightning `.ckpt` into an
orbax checkpoint usable by every CLI here (generate/evaluate/analyze/serve).

Usage:
    python -m medvae_tpu.cli.import_ckpt --ckpt epoch=7-val_loss=0.036.ckpt \\
        --experiment multi_modal_cvae_quick --output_dir imported_run

The experiment/overrides must reproduce the architecture the checkpoint was
trained with (same role the Hydra config played in the reference run).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Import a reference PyTorch Lightning checkpoint"
    )
    p.add_argument("--ckpt", required=True, help="Lightning .ckpt file")
    p.add_argument(
        "--experiment",
        default=None,
        help="experiment config matching the checkpoint's architecture",
    )
    p.add_argument(
        "--override",
        action="append",
        default=[],
        help="extra hydra-style config overrides (repeatable)",
    )
    p.add_argument("--output_dir", default="imported")
    args = p.parse_args(argv)

    from medvae_tpu.cli.train import default_config_dir
    from medvae_tpu.compat import import_lightning_checkpoint
    from medvae_tpu.config import compose

    overrides = list(args.override)
    if args.experiment:
        overrides.insert(0, f"experiment={args.experiment}")
    cfg = compose(default_config_dir(), "config", overrides)

    path = import_lightning_checkpoint(args.ckpt, cfg.to_dict(), args.output_dir)
    print(f"Checkpoint ready: {path}")
    print(
        "Use it like any run checkpoint, e.g.\n"
        f"  python -m medvae_tpu.cli.evaluate --model_path {path}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
