"""Native (C++) host data-pipeline layer.

This is the framework's native data-loader: the scattered-row batch gather
that dominates the host side of every train step runs in a small C++ library
(`feeder.cpp`), compiled on first use with the system g++ and driven through
ctypes (no pybind11 dependency). The reference gets the equivalent layer
from torch's C++ DataLoader machinery (src/data/medmnist_data.py:428-462).

Measured on this host (1 vCPU):
  * 224x224x3 rows (147 KB): numpy fancy-index 1.6 GB/s -> native 3.1 GB/s
    (1.9x; numpy's per-row overhead dominates large-row gathers)
  * 28x28x3 rows (2.3 KB): parity (~4.5 GB/s, both memory-bound)
On multi-core hosts the gather shards across threads (MEDVAE_NATIVE_THREADS,
default = cpu count, capped at 8).

Fallback discipline: anything failing here (no compiler, readonly cache dir,
load error) silently degrades to the numpy path — `assemble_batch` returns
None and DeviceFeeder keeps its pure-numpy `_gather`. Set MEDVAE_NATIVE=0 to
force the fallback; tests cover both paths and their exact equality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import tempfile
from typing import Dict, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "feeder.cpp")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> str:
    d = os.environ.get(
        "MEDVAE_NATIVE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "medvae_tpu",
        ),
    )
    os.makedirs(d, exist_ok=True)
    return d


def _build() -> Optional[str]:
    """Compile feeder.cpp -> cached .so; returns path or None.

    Everything is inside one try/except: the fallback contract is that NO
    host condition (readonly cache dir, missing compiler, full disk) can
    raise out of the native layer — `None` here means the numpy path."""
    try:
        cache = _cache_dir()
        tag = f"{os.path.getmtime(_SRC):.0f}_{sys.version_info[0]}"
        so = os.path.join(cache, f"medvae_feeder_{tag}.so")
        if os.path.exists(so):
            return so
        with tempfile.TemporaryDirectory(dir=cache) as tmp:
            tmp_so = os.path.join(tmp, "feeder.so")
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                _SRC, "-o", tmp_so,
            ]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp_so, so)  # atomic publish (concurrent builders race-safe)
        return so
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MEDVAE_NATIVE", "1") == "0":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.mv_gather_rows_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lib.mv_assemble_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _threads() -> int:
    env = os.environ.get("MEDVAE_NATIVE_THREADS")
    if env:
        return max(1, int(env))
    return max(1, min(8, os.cpu_count() or 1))


def available() -> bool:
    """True when the native library compiled and loaded on this host."""
    return _load() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray,
                out: Optional[np.ndarray] = None) -> Optional[np.ndarray]:
    """out[i] = src[idx[i]] via the native gather; None if unavailable.

    src must be C-contiguous with uint8 dtype; rows are src[j] flattened.
    """
    lib = _load()
    if lib is None or src.dtype != np.uint8 or not src.flags.c_contiguous:
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    n = len(idx)
    row_bytes = src[0].nbytes if src.shape[0] else 0
    if out is None:
        out = np.empty((n,) + src.shape[1:], np.uint8)
    lib.mv_gather_rows_u8(
        src.ctypes.data, idx.ctypes.data, n, row_bytes, out.ctypes.data,
        _threads(),
    )
    return out


def assemble_batch(
    images: np.ndarray,
    labels: np.ndarray,
    modality_idx: np.ndarray,
    idx: np.ndarray,
    channels_by_mod: np.ndarray,
    n_mod: int,
) -> Optional[Dict[str, np.ndarray]]:
    """Fused DeviceFeeder._gather: images/labels/midx gather + one-hot +
    channel lookup in one native pass. Returns None if the native library is
    unavailable or the inputs aren't in the expected layout (caller falls
    back to numpy)."""
    lib = _load()
    if (
        lib is None
        or images.dtype != np.uint8
        or not images.flags.c_contiguous
    ):
        return None
    idx = np.ascontiguousarray(idx, np.int64)
    labels32 = np.ascontiguousarray(labels, np.int32)
    midx32 = np.ascontiguousarray(modality_idx, np.int32)
    ch32 = np.ascontiguousarray(channels_by_mod, np.int32)
    n = len(idx)
    row_bytes = images[0].nbytes if images.shape[0] else 0
    out_images = np.empty((n,) + images.shape[1:], np.uint8)
    out_labels = np.empty((n,), np.int32)
    out_midx = np.empty((n,), np.int32)
    out_onehot = np.zeros((n, n_mod), np.float32)
    out_channels = np.empty((n,), np.int32)
    lib.mv_assemble_batch(
        images.ctypes.data, row_bytes, labels32.ctypes.data,
        midx32.ctypes.data, idx.ctypes.data, n, n_mod, ch32.ctypes.data,
        out_images.ctypes.data, out_labels.ctypes.data, out_midx.ctypes.data,
        out_onehot.ctypes.data, out_channels.ctypes.data, _threads(),
    )
    return {
        "image_u8": out_images,
        "label": out_labels,
        "modality_onehot": out_onehot,
        "modality_idx": out_midx,
        "channels": out_channels,
    }
