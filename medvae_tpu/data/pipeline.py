"""Device feed: double-buffered, mesh-sharded uint8 batches.

Replaces the reference's DataLoader workers / pin_memory / persistent_workers
(src/data/medmnist_data.py:428-462). Batches are gathered from the materialized
uint8 arrays with one fancy-index per step, placed on the mesh asynchronously
(dispatch is non-blocking in JAX, so host gather of batch N+1 overlaps device
compute of batch N), with the leading axis sharded over the `data` mesh axis.

Normalization (uint8 → [−1,1], the reference's Normalize(0.5, 0.5)) and
train-time augmentation (hflip / rotation ±10° / brightness-contrast jitter,
reference :333-341) are executed on device inside the jitted step — see
`normalize_and_augment`.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from medvae_tpu import native
from medvae_tpu.core.mesh import data_sharding
from medvae_tpu.data.medmnist import (
    CHANNELS_BY_MODALITY_INDEX,
    MODALITY_NAMES,
    SplitArrays,
)


def stratified_order(
    modality_idx: np.ndarray, rng: np.random.RandomState
) -> np.ndarray:
    """A permutation of [0, n) whose every contiguous window holds a
    near-proportional share of each modality.

    The batch-global separation / contrastive losses of the disentangled
    model (reference src/models/disentangled_conditional_vae.py:305-386) are
    only informative when a batch covers several modalities; a plain uniform
    shuffle at small batch sizes leaves batches modality-starved and the
    losses collapse (measured: bs 32 quick config fails the memo thresholds,
    bs 128 passes — README separation section). Stratification fixes the
    sampler instead of the batch size: shuffle within each modality, place
    member r of a c-member modality at fractional position (r + u)/c (u a
    per-epoch random phase), and sort all samples by position. Every window
    of B consecutive samples then contains B·c_m/n ± 1 samples of modality m
    — guaranteed coverage at any batch size ≥ the modality count, with
    contents still uniformly random within each modality.
    """
    n = len(modality_idx)
    members_all = []
    pos_all = []
    for m in np.unique(modality_idx):
        members = np.flatnonzero(modality_idx == m)
        rng.shuffle(members)
        c = len(members)
        members_all.append(members)
        pos_all.append((np.arange(c) + rng.uniform()) / c)
    idx = np.concatenate(members_all)
    pos = np.concatenate(pos_all)
    order = idx[np.argsort(pos, kind="stable")]
    assert len(order) == n
    return order


class DeviceFeeder:
    """Iterates device-resident batches over a split.

    * drops the ragged tail in train mode (static shapes under jit), pads the
      tail with wraparound in eval mode (mask carried so metrics stay exact)
    * shards the batch axis over the mesh's `data` axis
    * keeps one batch in flight (double buffering)
    * `stratify=True` (train only, needs shuffle) draws modality-stratified
      orders so every batch covers all modalities — see `stratified_order`
    """

    def __init__(
        self,
        arrays: SplitArrays,
        batch_size: int,
        mesh: Mesh,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,
        stratify: bool = False,
    ):
        self.arrays = arrays
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.stratify = bool(stratify) and shuffle
        self.prefetch = max(1, prefetch)
        self._rng = np.random.RandomState(seed)
        n = len(arrays)
        if drop_last:
            self.steps_per_epoch = max(1, n // batch_size) if n >= batch_size else 1
        else:
            self.steps_per_epoch = (n + batch_size - 1) // batch_size

    def _gather(self, idx: np.ndarray, valid: np.ndarray) -> Dict[str, np.ndarray]:
        a = self.arrays
        # native (C++) fused batch assembly when available: image-row gather +
        # one-hot + channel lookup in one pass (medvae_tpu/native). Falls back
        # to the numpy path transparently; both produce identical batches
        # (tests/test_native.py).
        batch = native.assemble_batch(
            a.images, a.labels, a.modality_idx, idx,
            CHANNELS_BY_MODALITY_INDEX, len(MODALITY_NAMES),
        )
        if batch is None:
            onehot = np.zeros((len(idx), len(MODALITY_NAMES)), np.float32)
            onehot[np.arange(len(idx)), a.modality_idx[idx]] = 1.0
            batch = {
                "image_u8": a.images[idx],
                "label": a.labels[idx],
                "modality_onehot": onehot,
                "modality_idx": a.modality_idx[idx],
                # natural channel count per sample, for on-device masking
                "channels": CHANNELS_BY_MODALITY_INDEX[a.modality_idx[idx]],
            }
        batch["valid"] = valid.astype(np.float32)
        return batch

    def _put(self, batch: Dict[str, np.ndarray]):
        if jax.process_count() > 1:
            # multi-host: this process supplies only its addressable shard
            # (batch rows for its dcn row); no cross-host batch transfer
            return {
                k: jax.make_array_from_process_local_data(
                    data_sharding(self.mesh, np.ndim(v)), v
                )
                for k, v in batch.items()
            }
        return {
            k: jax.device_put(v, data_sharding(self.mesh, np.ndim(v)))
            for k, v in batch.items()
        }

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, jax.Array]]:
        n = len(self.arrays)
        order = np.arange(n)
        if self.shuffle:
            self._rng.seed((epoch + 1) * 9973 + 7)
            if self.stratify:
                order = stratified_order(self.arrays.modality_idx, self._rng)
            else:
                self._rng.shuffle(order)

        bs = self.batch_size
        from collections import deque

        # multi-host: every process draws the same shuffled order (seeded
        # identically), then gathers only its own contiguous slice of each
        # global batch — rows [p*local : (p+1)*local] belong to process p's
        # dcn mesh row (core/mesh.py orders dcn rows by process_index)
        n_proc = jax.process_count()
        p = jax.process_index()
        assert bs % n_proc == 0, (
            f"global batch {bs} not divisible by {n_proc} processes"
        )
        local = bs // n_proc

        pending: deque = deque()
        for step in range(self.steps_per_epoch):
            lo = step * bs
            hi = min(lo + bs, n)
            idx = order[lo:hi]
            valid = np.ones(len(idx), bool)
            if len(idx) < bs:
                # wraparound pad, masked invalid (eval-mode tail); modulo
                # tiling so a shortfall larger than the dataset (bs > 2n)
                # still fills the batch to its full static shape
                pad = order[np.arange(bs - len(idx)) % n]
                valid = np.concatenate([valid, np.zeros(len(pad), bool)])
                idx = np.concatenate([idx, pad])
            if n_proc > 1:
                idx = idx[p * local : (p + 1) * local]
                valid = valid[p * local : (p + 1) * local]
            # device_put dispatches asynchronously: keep `prefetch` batches in
            # flight so host gather + transfer overlap device compute
            pending.append(self._put(self._gather(idx, valid)))
            if len(pending) > self.prefetch:
                yield pending.popleft()
        while pending:
            yield pending.popleft()


class DeviceCachedFeeder:
    """Device-resident dataset cache with fully on-device batch assembly.

    Motivation (measured on the live chip, 28² quick config, bs 4096): the
    host-streamed path pays ~300 ms/step of device-side serialization for the
    ~10 MB/step image transfer even though the wire time is ~8 ms and dispatch
    is async with prefetch — host→device copies do not overlap compute through
    this runtime, capping the end-to-end pipeline at ~12–16k img/s against a
    ~96 ms (43k img/s) device step. When the split's uint8 arrays fit an HBM
    budget, the TPU-idiomatic fix is to pin them on device ONCE and build every
    batch there: per-epoch `jax.random` permutation, row gather, one-hot and
    per-modality channel lookup, all inside one jitted function with the batch
    axis sharded over the mesh — zero steady-state host transfers. Measured at
    device-step speed (~98 ms/step ≈ 42k img/s end-to-end).

    Semantics match `DeviceFeeder` (same batch dict, per-epoch reshuffle,
    drop_last / wraparound-pad + `valid` mask) except the shuffle order comes
    from `jax.random` instead of `np.random` — both uniform, orders differ.
    Single-process only: multi-host runs keep the per-host `DeviceFeeder`.

    `stratify=True` makes `epoch_perm` emit a modality-stratified order (see
    `stratified_order`): the slot→(modality, rank) interleave pattern is
    static (computed once on host from the split's modality labels, with
    equal-count groups tying into an exact round-robin), and each epoch only
    the within-modality shuffles are drawn — on device, so the fused
    multi-step path (train/multistep.py) stays zero-host-transfer.
    """

    def __init__(
        self,
        arrays: SplitArrays,
        batch_size: int,
        mesh: Mesh,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 2,  # accepted for API parity with DeviceFeeder; unused
        stratify: bool = False,
    ):
        if jax.process_count() > 1:
            raise ValueError(
                "DeviceCachedFeeder is single-process; use DeviceFeeder for "
                "multi-host runs (each process feeds its own shard)"
            )
        del prefetch
        self.arrays = arrays
        self.batch_size = batch_size
        self.mesh = mesh
        self.shuffle = shuffle
        self.drop_last = drop_last
        n = len(arrays)
        self._n = n
        if drop_last:
            self.steps_per_epoch = max(1, n // batch_size) if n >= batch_size else 1
        else:
            self.steps_per_epoch = (n + batch_size - 1) // batch_size

        # pin the split on device, rows sharded over the batch axes; pad the
        # row count to the sharding extent with wraparound rows (indices only
        # ever address [0, n), so pad rows are storage, never data)
        from medvae_tpu.core.mesh import batch_axes

        axes = batch_axes(mesh)
        shards = int(
            np.prod([mesh.shape[a] for a in (axes if isinstance(axes, tuple) else (axes,))])
        )
        n_pad = ((n + shards - 1) // shards) * shards
        pad_idx = np.arange(n_pad) % n
        self._images = jax.device_put(
            arrays.images[pad_idx], data_sharding(mesh, arrays.images.ndim)
        )
        self._labels = jax.device_put(arrays.labels[pad_idx], data_sharding(mesh, 1))
        self._midx = jax.device_put(
            arrays.modality_idx[pad_idx], data_sharding(mesh, 1)
        )
        self._key = jax.random.PRNGKey(seed)

        num_mod = len(MODALITY_NAMES)
        ch_table = jnp.asarray(CHANNELS_BY_MODALITY_INDEX, jnp.int32)
        bs = batch_size
        out_shardings = {
            "image_u8": data_sharding(mesh, arrays.images.ndim),
            "label": data_sharding(mesh, 1),
            "modality_onehot": data_sharding(mesh, 2),
            "modality_idx": data_sharding(mesh, 1),
            "channels": data_sharding(mesh, 1),
            "valid": data_sharding(mesh, 1),
        }

        shuffle_on = self.shuffle

        def assemble(images, labels, midx, perm, step):
            pos = step * bs + jnp.arange(bs, dtype=jnp.int32)
            valid = (pos < n).astype(jnp.float32)
            idx = pos % n
            if shuffle_on:
                idx = jnp.take(perm, idx, axis=0)
            mi = jnp.take(midx, idx, axis=0)
            return {
                "image_u8": jnp.take(images, idx, axis=0),
                "label": jnp.take(labels, idx, axis=0),
                "modality_onehot": jax.nn.one_hot(mi, num_mod, dtype=jnp.float32),
                "modality_idx": mi,
                "channels": jnp.take(ch_table, mi, axis=0),
                "valid": valid,
            }

        from medvae_tpu.core.mesh import replicated_sharding

        # pure, traceable form — fused multi-step training (train/multistep.py)
        # calls this INSIDE its lax.scan so batch assembly rides the same
        # dispatch as the train steps
        self.assemble_traced = assemble
        self._assemble = jax.jit(assemble, out_shardings=out_shardings)
        self.stratify = bool(stratify) and self.shuffle
        if self.stratify:
            midx_h = np.asarray(arrays.modality_idx)
            present = np.unique(midx_h)
            counts = np.array([np.sum(midx_h == m) for m in present])
            maxc = int(counts.max())
            members = np.zeros((len(present), maxc), np.int32)
            pos_l, mod_l, rank_l = [], [], []
            for g, (m, c) in enumerate(zip(present, counts)):
                members[g, :c] = np.flatnonzero(midx_h == m)
                # deterministic 0.5 phase → equal-count groups tie and the
                # stable sort interleaves them exact-round-robin
                pos_l.append((np.arange(c) + 0.5) / c)
                mod_l.append(np.full(c, g))
                rank_l.append(np.arange(c))
            slots = np.argsort(np.concatenate(pos_l), kind="stable")
            slot_mod = jnp.asarray(np.concatenate(mod_l)[slots], jnp.int32)
            slot_rank = jnp.asarray(np.concatenate(rank_l)[slots], jnp.int32)
            members_j = jnp.asarray(members)
            valid = jnp.asarray(
                np.arange(maxc)[None, :] < counts[:, None]
            )

            def strat_perm(key):
                u = jax.random.uniform(key, (len(present), maxc))
                u = jnp.where(valid, u, jnp.inf)
                within = jnp.argsort(u, axis=1)  # valid ranks first, shuffled
                shuffled = jnp.take_along_axis(members_j, within, axis=1)
                return shuffled[slot_mod, slot_rank]

            self._perm = jax.jit(
                strat_perm, out_shardings=replicated_sharding(mesh)
            )
        else:
            self._perm = jax.jit(
                lambda key: jax.random.permutation(key, n),
                out_shardings=replicated_sharding(mesh),
            )

    def __len__(self) -> int:
        return self._n

    @property
    def cache_nbytes(self) -> int:
        return sum(int(a.nbytes) for a in (self._images, self._labels, self._midx))

    @property
    def device_arrays(self):
        """(images, labels, modality_idx) — the pinned device arrays, for
        in-graph assembly by fused multi-step execution."""
        return self._images, self._labels, self._midx

    def epoch_perm(self, epoch: int) -> jax.Array:
        """This epoch's device-resident shuffle permutation (placeholder when
        shuffle is off — assemble ignores it then)."""
        if not self.shuffle:
            return jnp.zeros((1,), jnp.int32)
        return self._perm(jax.random.fold_in(self._key, epoch))

    def epoch(self, epoch: int = 0) -> Iterator[Dict[str, jax.Array]]:
        perm = self.epoch_perm(epoch)
        for step in range(self.steps_per_epoch):
            yield self._assemble(
                self._images, self._labels, self._midx, perm,
                jnp.asarray(step, jnp.int32),
            )


def split_cache_nbytes(arrays: SplitArrays) -> int:
    """Host-side estimate of what DeviceCachedFeeder would pin in HBM."""
    return int(
        arrays.images.nbytes + arrays.labels.nbytes + arrays.modality_idx.nbytes
    )


def normalize_and_augment(
    image_u8: jax.Array,
    rng: Optional[jax.Array],
    *,
    normalize: bool = True,
    augment: bool = False,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """On-device preprocessing, fused into the jitted train step.

    uint8 → float [0,1] → (augment) → Normalize(0.5, 0.5) to [−1,1]
    (reference transform stack, src/data/medmnist_data.py:324-382).
    Augmentations (train only, reference :333-341): random horizontal flip
    p=0.5, rotation ±10°, brightness/contrast jitter ±0.1 — all batched, no
    per-sample host work.
    """
    x = image_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    if augment:
        assert rng is not None
        k_flip, k_rot, k_bri, k_con = jax.random.split(rng, 4)
        b = x.shape[0]

        # horizontal flip (p = 0.5)
        flip = jax.random.bernoulli(k_flip, 0.5, (b,))
        x = jnp.where(flip[:, None, None, None], x[:, :, ::-1, :], x)

        # rotation ±10° via batched bilinear resample on a rotated grid
        angles = jax.random.uniform(k_rot, (b,), minval=-10.0, maxval=10.0)
        x = _rotate_batch(x, angles * jnp.pi / 180.0)

        # brightness / contrast jitter (torchvision ColorJitter(0.1, 0.1))
        bri = jax.random.uniform(k_bri, (b, 1, 1, 1), minval=0.9, maxval=1.1)
        con = jax.random.uniform(k_con, (b, 1, 1, 1), minval=0.9, maxval=1.1)
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = jnp.clip((x * bri - mean) * con + mean, 0.0, 1.0)

    if normalize:
        x = x * 2.0 - 1.0
    return x


def _rotate_batch(x: jax.Array, angles: jax.Array) -> jax.Array:
    """Rotate each image by its own angle with bilinear sampling (zeros outside)."""
    b, h, w, c = x.shape
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=x.dtype), jnp.arange(w, dtype=x.dtype), indexing="ij"
    )
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yc, xc = yy - cy, xx - cx
    cos = jnp.cos(angles)[:, None, None]
    sin = jnp.sin(angles)[:, None, None]
    src_y = cos * yc - sin * xc + cy  # (b, h, w)
    src_x = sin * yc + cos * xc + cx

    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jax.vmap(lambda img, yy_, xx_: img[yy_, xx_])(x, yi_c, xi_c)
        return vals * inside[..., None].astype(x.dtype)

    out = (
        gather(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
        + gather(y0, x0 + 1) * ((1 - wy) * wx)[..., None]
        + gather(y0 + 1, x0) * (wy * (1 - wx))[..., None]
        + gather(y0 + 1, x0 + 1) * (wy * wx)[..., None]
    )
    return out
