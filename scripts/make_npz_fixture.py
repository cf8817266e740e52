#!/usr/bin/env python
"""Build tiny *format-faithful* MedMNIST-style npz fixtures.

Real MedMNIST archives (medmnist.info INFO[...]['url'], loaded by the
reference at src/data/medmnist_data.py:107-125) are npz files with keys
  {train,val,test}_images : uint8, (N, 28, 28) grayscale or (N, 28, 28, 3) RGB
  {train,val,test}_labels : (N, 1) class index, or (N, 14) multilabel for chest
This script writes fixtures with exactly those keys/dtypes/shapes (a few KB),
so the `npz -> channel policy -> pad -> train step` path is testable — and the
first run on a machine with the real downloads needs zero code changes
(drop the real npz under data/ with the same names).

Usage: python scripts/make_npz_fixture.py [--out DIR] [--n 24] [--size 28]
       [--datasets chestmnist pathmnist ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medvae_tpu.data.medmnist import DATASET_CHANNELS  # noqa: E402

# label-space shapes per dataset (MedMNIST conventions): chest is 14-way
# multilabel; everything else single class-index column
MULTILABEL = {"chestmnist": 14}
N_CLASSES = {
    "chestmnist": 2, "pathmnist": 9, "dermamnist": 7, "octmnist": 4,
    "pneumoniamnist": 2, "retinamnist": 5, "breastmnist": 2, "bloodmnist": 8,
    "tissuemnist": 8, "organamnist": 11, "organcmnist": 11, "organsmnist": 11,
}


def write_fixture(out_dir: str, dataset: str, n: int = 24, size: int = 28,
                  seed: int = 0) -> str:
    # stable digest, not hash(): PYTHONHASHSEED randomization would make the
    # "fixed seed" produce different fixtures per interpreter run
    rs = np.random.RandomState(seed + zlib.crc32(dataset.encode()) % 1000)
    ch = DATASET_CHANNELS[dataset.lower()]
    arrays = {}
    for split, count in (("train", n), ("val", max(4, n // 4)),
                         ("test", max(4, n // 4))):
        shape = (count, size, size) if ch == 1 else (count, size, size, 3)
        # structured blobs, not white noise: circle per class like the real
        # digits have structure (keeps PSNR/SSIM meaningful in tests)
        imgs = np.zeros(shape, np.uint8)
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
        if dataset.lower() in MULTILABEL:
            labels = (rs.rand(count, MULTILABEL[dataset.lower()]) < 0.2).astype(
                np.uint8
            )
            klass = labels.argmax(axis=1)
        else:
            klass = rs.randint(0, N_CLASSES[dataset.lower()], count)
            labels = klass[:, None].astype(np.uint8)
        for i in range(count):
            cx = 0.25 + 0.5 * (klass[i] % 3) / 2.0
            cy = 0.25 + 0.5 * (klass[i] // 3 % 3) / 2.0
            blob = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / 0.02))
            base = (blob * 200 + rs.rand(size, size) * 40).astype(np.uint8)
            imgs[i] = base if ch == 1 else np.stack(
                [base, (base * 0.8).astype(np.uint8),
                 (base * 0.6).astype(np.uint8)], axis=-1
            )
        arrays[f"{split}_images"] = imgs
        arrays[f"{split}_labels"] = labels
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{dataset.lower()}.npz")
    np.savez_compressed(path, **arrays)
    return path


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="data")
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--size", type=int, default=28)
    p.add_argument("--datasets", nargs="+",
                   default=["chestmnist", "pathmnist"])
    args = p.parse_args(argv)
    for d in args.datasets:
        path = write_fixture(args.out, d, args.n, args.size)
        with np.load(path) as z:
            shapes = {k: z[k].shape for k in z.files}
        print(f"{path}: {shapes}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
