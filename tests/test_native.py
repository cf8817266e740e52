"""Native (C++) batch-assembly layer: build, exact numpy equivalence, fallback.

The native feeder (medvae_tpu/native) replaces the reference's torch-C++
DataLoader layer (src/data/medmnist_data.py:428-462). These tests pin:
  * the library compiles and loads on this host (skip if no g++)
  * gather_rows == numpy fancy indexing, byte-exact
  * assemble_batch == DeviceFeeder's numpy fallback, field-exact
  * MEDVAE_NATIVE=0 cleanly disables it (fallback discipline)
"""

import numpy as np
import pytest

from medvae_tpu import native
from medvae_tpu.data.medmnist import (
    CHANNELS_BY_MODALITY_INDEX,
    MODALITY_NAMES,
    SplitArrays,
)


def _arrays(n=64, size=12, seed=0) -> SplitArrays:
    rs = np.random.RandomState(seed)
    return SplitArrays(
        images=rs.randint(0, 255, (n, size, size, 3), np.uint8),
        labels=rs.randint(0, 9, (n,), np.int32).astype(np.int32),
        modality_idx=(np.arange(n) % len(MODALITY_NAMES)).astype(np.int32),
        channels=3,
    )


def test_native_builds_and_loads():
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++ on this host")
    assert native.available()


def test_gather_rows_matches_numpy():
    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(1)
    src = rs.randint(0, 255, (100, 7, 5, 3), np.uint8)
    idx = rs.permutation(100)[:33]
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    # preallocated output buffer path
    buf = np.empty((33, 7, 5, 3), np.uint8)
    out2 = native.gather_rows(src, idx, out=buf)
    assert out2 is buf
    np.testing.assert_array_equal(buf, src[idx])


def test_gather_rows_rejects_noncontiguous():
    if not native.available():
        pytest.skip("native library unavailable")
    src = np.zeros((10, 4, 4, 3), np.uint8)[:, ::2]  # non-contiguous view
    assert native.gather_rows(src, np.arange(3)) is None


def test_assemble_batch_matches_numpy_gather():
    if not native.available():
        pytest.skip("native library unavailable")
    a = _arrays()
    rs = np.random.RandomState(2)
    idx = rs.permutation(len(a))[:32]
    got = native.assemble_batch(
        a.images, a.labels, a.modality_idx, idx,
        CHANNELS_BY_MODALITY_INDEX, len(MODALITY_NAMES),
    )
    assert got is not None
    onehot = np.zeros((len(idx), len(MODALITY_NAMES)), np.float32)
    onehot[np.arange(len(idx)), a.modality_idx[idx]] = 1.0
    np.testing.assert_array_equal(got["image_u8"], a.images[idx])
    np.testing.assert_array_equal(got["label"], a.labels[idx])
    np.testing.assert_array_equal(got["modality_idx"], a.modality_idx[idx])
    np.testing.assert_array_equal(got["modality_onehot"], onehot)
    np.testing.assert_array_equal(
        got["channels"], CHANNELS_BY_MODALITY_INDEX[a.modality_idx[idx]]
    )
    assert got["label"].dtype == np.int32
    assert got["modality_idx"].dtype == np.int32
    assert got["channels"].dtype == np.int32
    assert got["modality_onehot"].dtype == np.float32


def test_feeder_batches_identical_native_vs_fallback(monkeypatch):
    """DeviceFeeder must produce byte-identical batches either way."""
    if not native.available():
        pytest.skip("native library unavailable")
    import jax

    from medvae_tpu.core.mesh import create_mesh
    from medvae_tpu.data.pipeline import DeviceFeeder

    mesh = create_mesh()
    a = _arrays(n=64, size=8)

    def run():
        feeder = DeviceFeeder(a, 16, mesh, shuffle=True, drop_last=True, seed=3)
        return [
            {k: np.asarray(jax.device_get(v)) for k, v in b.items()}
            for b in feeder.epoch(0)
        ]

    native_batches = run()
    monkeypatch.setattr(native, "assemble_batch", lambda *a, **k: None)
    fallback_batches = run()
    assert len(native_batches) == len(fallback_batches) > 0
    for nb, fb in zip(native_batches, fallback_batches):
        assert set(nb) == set(fb)
        for k in nb:
            np.testing.assert_array_equal(nb[k], fb[k], err_msg=k)


def test_threaded_gather_matches_single_thread(monkeypatch):
    """Force the multi-thread shard path (1-core hosts never take it
    organically: run_sharded requires n_threads>1) and pin exactness."""
    if not native.available():
        pytest.skip("native library unavailable")
    rs = np.random.RandomState(7)
    src = rs.randint(0, 255, (512, 9, 9, 3), np.uint8)
    idx = rs.permutation(512)[:300]
    monkeypatch.setenv("MEDVAE_NATIVE_THREADS", "4")
    out = native.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])
    a = _arrays(n=256, size=6, seed=8)
    got = native.assemble_batch(
        a.images, a.labels, a.modality_idx, np.arange(256)[::-1],
        CHANNELS_BY_MODALITY_INDEX, len(MODALITY_NAMES),
    )
    np.testing.assert_array_equal(got["image_u8"], a.images[np.arange(256)[::-1]])
    np.testing.assert_array_equal(
        got["modality_idx"], a.modality_idx[np.arange(256)[::-1]]
    )


def test_env_gate_disables_native(monkeypatch):
    """MEDVAE_NATIVE=0 must yield the numpy fallback (assemble -> None)."""
    import importlib

    monkeypatch.setenv("MEDVAE_NATIVE", "0")
    import medvae_tpu.native as nat

    # reset the module-level load cache for this check, then restore
    old_lib, old_tried = nat._lib, nat._tried
    try:
        nat._lib, nat._tried = None, False
        assert not nat.available()
        assert nat.gather_rows(np.zeros((4, 2, 2, 3), np.uint8), np.arange(2)) is None
        a = _arrays(n=8, size=4)
        assert (
            nat.assemble_batch(
                a.images, a.labels, a.modality_idx, np.arange(4),
                CHANNELS_BY_MODALITY_INDEX, len(MODALITY_NAMES),
            )
            is None
        )
    finally:
        nat._lib, nat._tried = old_lib, old_tried
