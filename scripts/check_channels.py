#!/usr/bin/env python
"""Print the grayscale/RGB channel classification of every MedMNIST dataset
(reference check_channels.py:10-34 — introspection over INFO; here over the
framework's channel policy, which is the contract the models train against)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medvae_tpu.data.medmnist import DATASET_CHANNELS, MODALITY_NAMES


def main() -> None:
    print(f"{'idx':>3}  {'dataset':<16} {'channels':>8}  kind")
    for idx, name in enumerate(MODALITY_NAMES):
        c = DATASET_CHANNELS[name]
        kind = "grayscale" if c == 1 else "RGB"
        print(f"{idx:>3}  {name:<16} {c:>8}  {kind}")


if __name__ == "__main__":
    main()
