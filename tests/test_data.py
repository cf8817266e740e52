"""Data pipeline tests: channel policy, label standardization, fixed-shape
batches, mask semantics, feeder behavior (reference contracts from
src/data/medmnist_data.py — see test_modality_channels.py in the reference)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medvae_tpu.core.mesh import MeshSpec, create_mesh
from medvae_tpu.data.medmnist import (
    CHANNELS_BY_MODALITY_INDEX,
    DATASET_CHANNELS,
    MODALITY_NAMES,
    MedMNISTDataModule,
    MedMNISTSource,
    modality_index,
    _standardize_labels,
)
from medvae_tpu.data.pipeline import (
    DeviceCachedFeeder,
    DeviceFeeder,
    normalize_and_augment,
    split_cache_nbytes,
)


def test_modality_map_order():
    # the 12-name order is part of the conditioning contract
    assert MODALITY_NAMES[0] == "chestmnist"
    assert MODALITY_NAMES[2] == "octmnist"
    assert MODALITY_NAMES[11] == "organsmnist"
    assert modality_index("dermamnist") == 4


def test_channel_policy():
    # grayscale: X-rays and CT; RGB: microscopy/pathology (reference :154-181)
    for name in ["chestmnist", "pneumoniamnist", "organamnist"]:
        assert DATASET_CHANNELS[name] == 1
    for name in ["pathmnist", "dermamnist", "octmnist", "bloodmnist"]:
        assert DATASET_CHANNELS[name] == 3


def test_source_shapes_and_padding():
    src = MedMNISTSource("chestmnist", split="val", size=28, root="/nonexistent",
                         max_channels=3)
    a = src.arrays
    assert a.images.shape[1:] == (28, 28, 3)
    assert a.images.dtype == np.uint8
    assert a.channels == 1
    # padded channels must be exactly zero
    assert a.images[..., 1:].max() == 0
    assert (a.modality_idx == 0).all()

    rgb = MedMNISTSource("pathmnist", split="val", size=28, root="/nonexistent",
                         max_channels=3)
    assert rgb.arrays.images[..., 1:].max() > 0


def test_label_standardization():
    # multi-label -> argmax; all-zero -> 0; column vector -> squeeze
    multi = np.array([[0, 1, 0], [0, 0, 0], [1, 0, 1]])
    np.testing.assert_array_equal(_standardize_labels(multi), [1, 0, 0])
    col = np.array([[3], [5]])
    np.testing.assert_array_equal(_standardize_labels(col), [3, 5])


def test_datamodule_concat_and_channels():
    dm = MedMNISTDataModule(
        ["chestmnist", "pathmnist"], batch_size=16, size=28, root="/nonexistent"
    )
    dm.setup(None)
    tr = dm.train_arrays
    assert dm.max_channels == 3
    assert tr.images.shape[1:] == (28, 28, 3)
    assert set(np.unique(tr.modality_idx)) == {0, 1}
    assert len(tr) == 2 * 2048  # synthetic split sizes


def test_feeder_shapes_and_masks():
    dm = MedMNISTDataModule(["chestmnist"], batch_size=100, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    feeder = DeviceFeeder(dm.val_arrays, 100, mesh, shuffle=False, drop_last=False)
    batches = list(feeder.epoch(0))
    # 256 samples / 100 -> 3 batches, last one padded with 44 invalid
    assert len(batches) == 3
    last = batches[-1]
    # single-modality module keeps the natural channel count (no padding)
    assert last["image_u8"].shape == (100, 28, 28, 1)
    assert float(jnp.sum(last["valid"])) == 56
    assert batches[0]["modality_onehot"].shape == (100, 12)
    np.testing.assert_array_equal(
        np.asarray(batches[0]["channels"]), np.ones(100)
    )


def test_feeder_shuffles_between_epochs():
    dm = MedMNISTDataModule(["chestmnist"], batch_size=32, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    feeder = DeviceFeeder(dm.train_arrays, 32, mesh, shuffle=True, drop_last=True)
    b0 = np.asarray(next(iter(feeder.epoch(0)))["label"])
    b1 = np.asarray(next(iter(feeder.epoch(1)))["label"])
    assert not np.array_equal(b0, b1)


def test_normalize_and_augment():
    u8 = jnp.asarray(np.random.RandomState(0).randint(0, 255, (4, 28, 28, 3)),
                     jnp.uint8)
    x = normalize_and_augment(u8, None, normalize=True, augment=False)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    x2 = normalize_and_augment(u8, None, normalize=False, augment=False)
    assert float(x2.min()) >= 0.0 and float(x2.max()) <= 1.0
    # augmentation is random but shape/range-preserving and traceable
    xa = jax.jit(
        lambda u, k: normalize_and_augment(u, k, normalize=True, augment=True)
    )(u8, jax.random.PRNGKey(0))
    assert xa.shape == x.shape
    assert np.isfinite(np.asarray(xa)).all()


def _batch_rows(batches):
    """(label, modality_idx) rows of the valid samples across an epoch."""
    rows = []
    for b in batches:
        v = np.asarray(b["valid"]) > 0
        rows += list(
            zip(np.asarray(b["label"])[v], np.asarray(b["modality_idx"])[v])
        )
    return rows


def test_device_cached_feeder_matches_host_feeder_eval():
    """Cached eval path (shuffle=False, wraparound pad + mask) must yield the
    exact same batches as the host DeviceFeeder — order, shapes, onehot,
    channels, and valid mask."""
    dm = MedMNISTDataModule(["chestmnist", "pathmnist"], batch_size=100, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    host = DeviceFeeder(dm.val_arrays, 100, mesh, shuffle=False, drop_last=False)
    dev = DeviceCachedFeeder(dm.val_arrays, 100, mesh, shuffle=False,
                             drop_last=False)
    hb = list(host.epoch(0))
    db = list(dev.epoch(0))
    assert len(hb) == len(db) == dev.steps_per_epoch
    for h, d in zip(hb, db):
        for k in h:
            np.testing.assert_array_equal(
                np.asarray(h[k]), np.asarray(d[k]), err_msg=k
            )


def test_device_cached_feeder_shuffle_is_a_permutation():
    """Shuffled cached epochs must cover exactly the dataset (a permutation —
    no dropped or duplicated samples), differ between epochs, and carry
    channels/onehot consistent with modality_idx."""
    dm = MedMNISTDataModule(["chestmnist", "pathmnist"], batch_size=128, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    arrays = dm.train_arrays
    dev = DeviceCachedFeeder(arrays, 128, mesh, shuffle=True, drop_last=True)
    b0 = list(dev.epoch(0))
    expect = sorted(zip(arrays.labels, arrays.modality_idx))
    assert sorted(_batch_rows(b0)) == expect  # full cover, no dups
    # per-sample invariants
    for b in b0[:2]:
        mi = np.asarray(b["modality_idx"])
        np.testing.assert_array_equal(
            np.asarray(b["channels"]), CHANNELS_BY_MODALITY_INDEX[mi]
        )
        np.testing.assert_array_equal(
            np.argmax(np.asarray(b["modality_onehot"]), axis=1), mi
        )
    # reshuffles between epochs
    b1 = next(iter(dev.epoch(1)))
    assert not np.array_equal(
        np.asarray(b0[0]["label"]), np.asarray(b1["label"])
    )


def test_device_cached_feeder_multidevice_mesh():
    """Cached assembly on the 8-device mesh: batches come out sharded over
    the data axis and still form an exact permutation of the dataset."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    dm = MedMNISTDataModule(["chestmnist"], batch_size=64, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    arrays = dm.train_arrays
    dev = DeviceCachedFeeder(arrays, 64, mesh, shuffle=True, drop_last=True)
    batches = list(dev.epoch(3))
    b = batches[0]
    assert b["image_u8"].shape == (64, 28, 28, 1)
    assert len(b["image_u8"].sharding.device_set) == 8
    assert sorted(_batch_rows(batches)) == sorted(
        zip(arrays.labels, arrays.modality_idx)
    )
    assert split_cache_nbytes(arrays) >= arrays.images.nbytes


def test_synthetic_determinism():
    a = MedMNISTSource("pathmnist", split="train", size=28, root="/nonexistent")
    b = MedMNISTSource("pathmnist", split="train", size=28, root="/nonexistent")
    np.testing.assert_array_equal(a.arrays.images, b.arrays.images)


def test_synthetic_disk_cache(tmp_path):
    """At 112²+ the synthetic splits are disk-cached under <root>/_synth_cache
    (minutes of host numpy otherwise repaid on every supervised restart).
    Cached and regenerated arrays must be identical, the synthetic flag must
    survive a cache hit, and a corrupt cache must regenerate, not crash."""
    root = str(tmp_path)
    a = MedMNISTSource("pathmnist", split="val", size=112, root=root)
    cache = tmp_path / "_synth_cache" / "pathmnist_val_112_s0.npz"
    assert a.synthetic and cache.exists()
    b = MedMNISTSource("pathmnist", split="val", size=112, root=root)
    assert b.synthetic  # cache hit must not look like real data
    np.testing.assert_array_equal(a.arrays.images, b.arrays.images)
    np.testing.assert_array_equal(a.arrays.labels, b.arrays.labels)
    cache.write_bytes(b"not an npz")
    c = MedMNISTSource("pathmnist", split="val", size=112, root=root)
    assert c.synthetic
    np.testing.assert_array_equal(a.arrays.images, c.arrays.images)
    # small sizes skip the cache entirely (tests pass fake roots like
    # /nonexistent; regeneration is cheap there)
    MedMNISTSource("pathmnist", split="val", size=28, root=root)
    assert not (tmp_path / "_synth_cache" / "pathmnist_val_28_s0.npz").exists()
    # a missing root dir is created on demand: pure-synthetic runs (the main
    # consumer) have no data dir at all
    fresh = tmp_path / "no_such_dir_yet"
    d = MedMNISTSource("pathmnist", split="val", size=112, root=str(fresh))
    assert d.synthetic
    assert (fresh / "_synth_cache" / "pathmnist_val_112_s0.npz").exists()
    np.testing.assert_array_equal(a.arrays.images, d.arrays.images)


def test_npz_loading(tmp_path):
    # write a fake MedMNIST-format npz and check the loader path
    rs = np.random.RandomState(0)
    np.savez(
        tmp_path / "chestmnist.npz",
        train_images=rs.randint(0, 255, (32, 28, 28), np.uint8),
        train_labels=rs.randint(0, 2, (32, 14)),
        val_images=rs.randint(0, 255, (8, 28, 28), np.uint8),
        val_labels=rs.randint(0, 2, (8, 14)),
        test_images=rs.randint(0, 255, (8, 28, 28), np.uint8),
        test_labels=rs.randint(0, 2, (8, 14)),
    )
    src = MedMNISTSource("chestmnist", split="train", size=28, root=str(tmp_path))
    assert not src.synthetic
    assert src.arrays.images.shape == (32, 28, 28, 3)  # padded to max_channels
    assert src.arrays.labels.shape == (32,)
    with pytest.raises(FileNotFoundError):
        MedMNISTSource("pathmnist", split="train", size=28, root=str(tmp_path),
                       synthetic_fallback=False)


def test_synthetic_banner_single_source_of_truth():
    """The SYNTHETIC DATA warning is owned by the datamodule (one wording for
    trainer and evaluate); it names the fallback datasets and the root."""
    dm = MedMNISTDataModule(
        dataset_names=["chestmnist", "pathmnist"], size=28,
        root="/nonexistent", batch_size=8,
    )
    assert dm.synthetic_banner() is None  # nothing loaded yet
    dm.setup("fit")
    banner = dm.synthetic_banner("evaluating")
    assert banner is not None
    assert "SYNTHETIC DATA" in banner
    assert "chestmnist" in banner and "pathmnist" in banner
    assert "evaluating" in banner and "/nonexistent" in banner


# ---------------------------------------------------------------------- #
# Modality-stratified batch sampling (data.stratify_batches)
# ---------------------------------------------------------------------- #

_FIVE = ["chestmnist", "octmnist", "pathmnist", "dermamnist", "pneumoniamnist"]


def _coverage_ok(order, midx, bs, num_mod):
    """Every full batch window must contain every modality, with counts
    within ±1 of the proportional share."""
    n = len(order)
    counts = np.bincount(midx, minlength=midx.max() + 1).astype(float)
    for lo in range(0, n - bs + 1, bs):
        window = midx[order[lo : lo + bs]]
        got = np.bincount(window, minlength=len(counts))
        for m in np.flatnonzero(counts):
            share = bs * counts[m] / n
            assert got[m] >= 1, f"batch at {lo} missing modality {m}"
            assert abs(got[m] - share) <= 1.0 + 1e-9, (
                f"batch at {lo}: modality {m} count {got[m]} vs share {share}"
            )


def test_stratified_order_host():
    """Host-side stratified order: a permutation whose every bs-window covers
    all modalities proportionally — the property that keeps the disentangled
    model's batch-global separation/contrastive losses informative at bs 32."""
    from medvae_tpu.data.pipeline import stratified_order

    dm = MedMNISTDataModule(_FIVE, batch_size=32, size=28, root="/nonexistent")
    dm.setup(None)
    arrays = dm.val_arrays
    rng = np.random.RandomState(0)
    order = stratified_order(arrays.modality_idx, rng)
    np.testing.assert_array_equal(np.sort(order), np.arange(len(arrays)))
    _coverage_ok(order, arrays.modality_idx, 32, 5)
    # a second draw shuffles within modalities
    order2 = stratified_order(arrays.modality_idx, rng)
    assert not np.array_equal(order, order2)


def test_stratified_host_feeder_batches():
    dm = MedMNISTDataModule(_FIVE, batch_size=32, size=28, root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    feeder = DeviceFeeder(dm.val_arrays, 32, mesh, shuffle=True,
                          drop_last=True, stratify=True)
    seen = []
    for b in feeder.epoch(0):
        mi = np.asarray(b["modality_idx"])
        assert len(np.unique(mi)) == 5  # every batch covers all modalities
        seen.append(mi)
    # epoch is still a full permutation of the split
    got = np.sort(np.concatenate(seen))
    want = np.sort(dm.val_arrays.modality_idx[: len(got)])
    assert np.bincount(got, minlength=12).sum() == len(got)


def test_stratified_cached_feeder_perm():
    """Device-side stratified epoch_perm: permutation + coverage + fresh
    within-modality shuffles per epoch, all computed on device (the fused
    multi-step path consumes this exact array in-graph)."""
    dm = MedMNISTDataModule(_FIVE, batch_size=32, size=28, root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    arrays = dm.val_arrays
    dev = DeviceCachedFeeder(arrays, 32, mesh, shuffle=True, drop_last=True,
                             stratify=True)
    p0 = np.asarray(dev.epoch_perm(0))
    p1 = np.asarray(dev.epoch_perm(1))
    np.testing.assert_array_equal(np.sort(p0), np.arange(len(arrays)))
    np.testing.assert_array_equal(np.sort(p1), np.arange(len(arrays)))
    assert not np.array_equal(p0, p1)
    _coverage_ok(p0, arrays.modality_idx, 32, 5)
    _coverage_ok(p1, arrays.modality_idx, 32, 5)
    # equal-count groups interleave round-robin: the static slot pattern is
    # deterministic, so the modality sequence is identical across epochs
    np.testing.assert_array_equal(
        arrays.modality_idx[p0], arrays.modality_idx[p1]
    )
    # and batches assembled from the perm carry matching onehot/channels
    b = next(iter(dev.epoch(0)))
    mi = np.asarray(b["modality_idx"])
    assert len(np.unique(mi)) == 5
    np.testing.assert_array_equal(
        np.asarray(b["channels"]), CHANNELS_BY_MODALITY_INDEX[mi]
    )


def test_stratified_unbalanced_groups():
    """Unequal modality counts: coverage stays proportional (rare modality
    appears in every window once its share rounds to ≥1)."""
    from medvae_tpu.data.medmnist import SplitArrays
    from medvae_tpu.data.pipeline import stratified_order

    rs = np.random.RandomState(1)
    midx = np.concatenate([np.zeros(600, np.int32), np.full(200, 2, np.int32),
                           np.full(200, 4, np.int32)])
    rs.shuffle(midx)
    order = stratified_order(midx, rs)
    np.testing.assert_array_equal(np.sort(order), np.arange(1000))
    # windows of 40: expect 24 of mod0, 8 of mod2, 8 of mod4 (±1)
    for lo in range(0, 1000 - 40 + 1, 40):
        got = np.bincount(midx[order[lo:lo + 40]], minlength=5)
        assert abs(got[0] - 24) <= 1 and abs(got[2] - 8) <= 1 \
            and abs(got[4] - 8) <= 1

    # cached feeder path on the same unbalanced layout
    arrays = SplitArrays(
        images=np.zeros((1000, 4, 4, 3), np.uint8),
        labels=np.zeros(1000, np.int32),
        modality_idx=midx, channels=3,
    )
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    dev = DeviceCachedFeeder(arrays, 40, mesh, shuffle=True, drop_last=True,
                             stratify=True)
    p = np.asarray(dev.epoch_perm(7))
    np.testing.assert_array_equal(np.sort(p), np.arange(1000))
    for lo in range(0, 1000 - 40 + 1, 40):
        got = np.bincount(midx[p[lo:lo + 40]], minlength=5)
        assert abs(got[0] - 24) <= 1 and abs(got[2] - 8) <= 1 \
            and abs(got[4] - 8) <= 1
