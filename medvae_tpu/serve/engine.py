"""Batched inference engine — the serving-side runtime of the framework.

The reference has no serving story (its closest surfaces are the one-shot
`generate.py` / `evaluate.py` scripts, reference generate.py:18-142); this
module is the production-deployment counterpart the TPU build adds:

  * **static-shape bucketing** — requests of any size are padded up to a
    fixed set of batch buckets so XLA compiles a handful of programs once
    and every request hits a cached executable (no recompiles, the TPU
    serving discipline).
  * **deterministic inference** — reconstruction/encode use the posterior
    mean (no reparameterization draw), the standard serving semantics for
    a VAE; sampling takes an explicit seed.
  * **model-family dispatch** — Base/Beta (unconditional), ConditionalVAE
    (one-hot condition), DisentangledConditionalVAE (modality-index routed
    heads), mirroring the train-side dispatch (train/step.py:make_forward_fn).
  * **micro-batching** — `MicroBatcher` coalesces concurrent single-image
    requests into one device batch (latency bound + size bound), the usual
    TPU serving frontend.

Input contract: images are NHWC uint8 (or float already in [-1, 1]); uint8
is normalized exactly as training does (x/255 * 2 - 1, data/pipeline.py).
Outputs are float32 in [-1, 1]; `to_uint8` converts for transport.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.data.medmnist import MODALITY_NAMES, modality_index
from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE

DEFAULT_BUCKETS = (1, 8, 32, 128)


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 [0, 255] (transport encoding).

    Rounds (not truncates) so the host helper is bit-identical to the
    engine's on-device output="uint8" conversion."""
    return np.clip(
        np.round((np.asarray(x, np.float32) + 1.0) * 127.5), 0, 255
    ).astype(np.uint8)


class InferenceEngine:
    """Shape-bucketed, jit-cached inference over a trained VAE.

    Every public method accepts arbitrary request sizes; internally the
    batch is chunked to the largest bucket and the tail padded up to the
    smallest covering bucket, so only len(buckets) executables exist per
    method. `warmup()` precompiles them all ahead of traffic.
    """

    def __init__(
        self,
        model,
        params,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        seed: int = 0,
        mesh=None,
    ):
        """`mesh`: optional jax.sharding.Mesh — weights are replicated and
        request batches sharded over its data axis, so one engine serves at
        full-slice throughput (throughput serving over ICI). Buckets are
        rounded up to multiples of the data-axis size so every executable
        has an even per-device shard."""
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from medvae_tpu.core.mesh import DATA_AXIS, DCN_AXIS, replicate

            params = replicate(mesh, params)
            # the batch shards over (dcn, data); model-axis devices see the
            # full shard, so buckets only need data-extent multiples
            n_data = int(mesh.shape[DATA_AXIS]) * int(
                mesh.shape.get(DCN_AXIS, 1)
            )
            buckets = [-(-int(b) // n_data) * n_data for b in buckets]
        self.params = params
        self.buckets = tuple(sorted(set(int(b) for b in buckets)))
        if not self.buckets or self.buckets[0] < 1:
            raise ValueError(f"invalid buckets: {buckets}")
        self._rng = jax.random.PRNGKey(seed)
        self._rng_lock = threading.Lock()
        self._is_disentangled = isinstance(model, DisentangledConditionalVAE)
        self._is_conditional = isinstance(model, ConditionalVAE)

        variables = {"params": params}
        m = model

        # --- jitted graphs (weights donated to the cache via closure) -----
        def _to_model_input(x):
            # uint8 requests are normalized IN-GRAPH (x/255*2-1, fp32 math —
            # identical values to host-side normalization) so the wire format
            # stays uint8: 4x fewer bytes host->device. Measured 5.4x
            # reconstruct throughput through a tunneled PJRT link where
            # transfers serialize against compute (SERVING.md).
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            return x

        @jax.jit
        def _encode(x, midx, onehot):
            x = _to_model_input(x)
            if self._is_disentangled:
                mean, logvar = m.apply(variables, x, midx, method=m.encode)
            elif self._is_conditional:
                mean, logvar = m.apply(variables, x, onehot, method=m.encode)
            else:
                mean, logvar = m.apply(variables, x, method=m.encode)
            return mean.astype(jnp.float32), logvar.astype(jnp.float32)

        @jax.jit
        def _decode(z, midx):
            z = z.astype(m.dtype)
            if self._is_disentangled:
                out = m.apply(variables, z, midx, method=m.decode)
            else:
                out = m.apply(variables, z, method=m.decode)
            return out.astype(jnp.float32)

        @jax.jit
        def _reconstruct(x, midx, onehot):
            mean, _ = _encode(x, midx, onehot)
            return _decode(mean, midx)

        def _sample(n: int, midx, onehot, key):
            if self._is_disentangled:
                return m.apply(
                    variables, n, midx, key, method=m.sample_conditional
                ).astype(jnp.float32)
            if self._is_conditional:
                return m.apply(
                    variables, n, onehot, key, method=m.conditional_sample
                ).astype(jnp.float32)
            return m.apply(variables, n, key, method=m.sample).astype(
                jnp.float32
            )

        self._encode_fn = _encode
        self._decode_fn = _decode
        self._reconstruct_fn = _reconstruct
        self._sample_fn = jax.jit(_sample, static_argnums=0)
        # [-1,1] float -> uint8 image, on device: shrinks the device->host
        # result transfer 4x for image endpoints (output="uint8")
        self._to_u8_fn = jax.jit(
            lambda r: jnp.clip(jnp.round((r + 1.0) * 127.5), 0, 255).astype(
                jnp.uint8
            )
        )

    # ------------------------------------------------------------------ #
    # construction                                                        #
    # ------------------------------------------------------------------ #

    @classmethod
    def from_checkpoint(
        cls,
        ckpt_path: str,
        config_path: Optional[str] = None,
        buckets: Sequence[int] = DEFAULT_BUCKETS,
        mesh=None,
        use_ema: bool = False,
    ) -> "InferenceEngine":
        """`use_ema`: serve the EMA weight average when the checkpoint
        carries one (training.ema_decay > 0), the usual deployment choice."""
        from medvae_tpu.cli.common import load_model_and_params

        model, params, _ = load_model_and_params(
            ckpt_path, config_path, use_ema=use_ema
        )
        return cls(model, params, buckets=buckets, mesh=mesh)

    # ------------------------------------------------------------------ #
    # request plumbing                                                    #
    # ------------------------------------------------------------------ #

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunks(self, n: int):
        """Yield (start, length, bucket) covering n requests."""
        big = self.buckets[-1]
        lo = 0
        while n - lo > big:
            yield lo, big, big
            lo += big
        if n - lo > 0:
            yield lo, n - lo, self._bucket_for(n - lo)

    def _norm_images(self, images: np.ndarray) -> np.ndarray:
        """uint8 passes through (normalized in-graph, keeping the
        host->device wire format at 1 byte/px); float input is assumed
        already in [-1, 1]."""
        x = np.asarray(images)
        if x.ndim == 3:
            x = x[None]
        if x.dtype == np.uint8:
            return x
        return np.asarray(x, np.float32)

    @property
    def _cond_width(self) -> int:
        """One-hot width the model's condition head was built for (cond_dim
        for ConditionalVAE — it may differ from 12; 12 otherwise, unused by
        the non-conditional paths)."""
        if self._is_conditional and not self._is_disentangled:
            return int(getattr(self.model, "cond_dim", len(MODALITY_NAMES)))
        return len(MODALITY_NAMES)

    def _modality_arrays(
        self, modality, n: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(modality_idx int32 (n,), onehot float32 (n, cond_width))."""
        if modality is None:
            midx = np.zeros((n,), np.int32)
        elif isinstance(modality, str):
            midx = np.full((n,), modality_index(modality), np.int32)
        else:
            midx = np.asarray(modality, np.int32).reshape(-1)
            if midx.shape[0] == 1 and n > 1:
                midx = np.full((n,), midx[0], np.int32)
        if midx.shape[0] != n:
            raise ValueError(f"modality length {midx.shape[0]} != batch {n}")
        # reject out-of-range indices (a clip would silently serve the wrong
        # modality); the bound is what /info advertises for this model
        bound = (
            int(self.model.num_modalities)
            if self._is_disentangled
            else self._cond_width
        )
        if midx.size and (midx.min() < 0 or midx.max() >= bound):
            raise ValueError(
                f"modality index out of range [0, {bound}) for "
                f"{type(self.model).__name__}: {midx[(midx < 0) | (midx >= bound)][:8]}"
            )
        w = self._cond_width
        onehot = np.zeros((n, w), np.float32)
        onehot[np.arange(n), np.clip(midx, 0, w - 1)] = 1.0
        return midx, onehot

    def _pad(self, a: np.ndarray, bucket: int):
        if a.shape[0] != bucket:
            pad = np.zeros((bucket - a.shape[0],) + a.shape[1:], a.dtype)
            a = np.concatenate([a, pad], axis=0)
        if self.mesh is not None:
            from medvae_tpu.core.mesh import data_sharding

            a = jax.device_put(a, data_sharding(self.mesh, a.ndim))
        return a

    def _next_key(self):
        with self._rng_lock:
            self._rng, key = jax.random.split(self._rng)
        return key

    # ------------------------------------------------------------------ #
    # public API                                                          #
    # ------------------------------------------------------------------ #

    def reconstruct(self, images, modality=None, output: str = "float32") -> np.ndarray:
        """Deterministic reconstruction (posterior-mean decode).

        `output="uint8"` converts [-1,1] -> [0,255] on device before the
        result transfer (4x fewer bytes; the natural format for image
        endpoints)."""
        x = self._norm_images(images)
        n = x.shape[0]
        midx, onehot = self._modality_arrays(modality, n)
        outs = []
        for lo, ln, b in self._chunks(n):
            r = self._reconstruct_fn(
                self._pad(x[lo : lo + ln], b),
                self._pad(midx[lo : lo + ln], b),
                self._pad(onehot[lo : lo + ln], b),
            )
            if output == "uint8":
                r = self._to_u8_fn(r)
            outs.append(np.asarray(jax.device_get(r))[:ln])
        return np.concatenate(outs, axis=0)

    def encode(self, images, modality=None) -> Tuple[np.ndarray, np.ndarray]:
        """Posterior (mean, logvar), flattened per-sample."""
        x = self._norm_images(images)
        n = x.shape[0]
        midx, onehot = self._modality_arrays(modality, n)
        means, logvars = [], []
        for lo, ln, b in self._chunks(n):
            mean, logvar = self._encode_fn(
                self._pad(x[lo : lo + ln], b),
                self._pad(midx[lo : lo + ln], b),
                self._pad(onehot[lo : lo + ln], b),
            )
            means.append(np.asarray(jax.device_get(mean))[:ln])
            logvars.append(np.asarray(jax.device_get(logvar))[:ln])
        return np.concatenate(means), np.concatenate(logvars)

    def decode(self, z, modality=None, output: str = "float32") -> np.ndarray:
        z = np.asarray(z, np.float32)
        n = z.shape[0]
        midx, _ = self._modality_arrays(modality, n)
        outs = []
        for lo, ln, b in self._chunks(n):
            r = self._decode_fn(
                self._pad(z[lo : lo + ln], b), self._pad(midx[lo : lo + ln], b)
            )
            if output == "uint8":
                r = self._to_u8_fn(r)
            outs.append(np.asarray(jax.device_get(r))[:ln])
        return np.concatenate(outs, axis=0)

    def sample(
        self, num_samples: int, modality=None, seed=None, output: str = "float32"
    ) -> np.ndarray:
        """Prior samples; seeded explicitly or from the engine stream."""
        n = int(num_samples)
        midx, onehot = self._modality_arrays(modality, n)
        key = (
            jax.random.PRNGKey(int(seed)) if seed is not None else self._next_key()
        )
        outs = []
        for i, (lo, ln, b) in enumerate(self._chunks(n)):
            r = self._sample_fn(
                b,
                self._pad(midx[lo : lo + ln], b),
                self._pad(onehot[lo : lo + ln], b),
                jax.random.fold_in(key, i),
            )
            if output == "uint8":
                r = self._to_u8_fn(r)
            outs.append(np.asarray(jax.device_get(r))[:ln])
        return np.concatenate(outs, axis=0)

    def warmup(self) -> int:
        """Precompile every (method, bucket) executable; returns count.

        reconstruct/encode/decode/sample each compile their own executable
        per bucket (reconstruct's fused graph does not serve standalone
        encode/decode requests), so all four are driven here."""
        res = int(self.model.resolution)
        c = int(getattr(self.model, "max_channels", 0) or self.model.input_channels)
        n_compiled = 0
        for b in self.buckets:
            x = np.zeros((b, res, res, c), np.uint8)
            self.reconstruct(x)
            mean, _ = self.encode(x)
            self.decode(mean)
            self.sample(b, seed=0)
            n_compiled += 4
        return n_compiled

    def info(self) -> Dict[str, Any]:
        m = self.model
        return {
            "model": type(m).__name__,
            "resolution": int(m.resolution),
            "input_channels": int(
                getattr(m, "max_channels", 0) or m.input_channels
            ),
            # total_latent_dim first: the disentangled model inherits (and
            # ignores) BaseVAE.latent_dim, its real latent is shared+modality
            "latent_dim": int(getattr(m, "total_latent_dim", 0))
            or int(getattr(m, "latent_dim", 0)),
            "buckets": list(self.buckets),
            "modalities": (
                list(MODALITY_NAMES[: m.num_modalities])
                if self._is_disentangled
                else list(MODALITY_NAMES[: self._cond_width])
            ),
            "conditional": self._is_conditional or self._is_disentangled,
        }


class MicroBatcher:
    """Coalesces concurrent reconstruct requests into device batches.

    submit() returns a Future; a background thread flushes the queue when
    `max_batch` requests are pending or `max_delay_ms` has elapsed since the
    first queued request — the standard latency/throughput serving knob.
    """

    def __init__(self, engine: InferenceEngine, max_batch: int = 32,
                 max_delay_ms: float = 5.0):
        self.engine = engine
        self.max_batch = int(max_batch)
        self.max_delay = float(max_delay_ms) / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # serializes the stop-check+enqueue in submit() against close()'s
        # stop-set+drain: without it a submit could pass the check, lose the
        # CPU, and enqueue AFTER the drain — a Future nobody ever resolves
        self._submit_lock = threading.Lock()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image: np.ndarray, modality=None) -> Future:
        with self._submit_lock:
            if self._stop.is_set():
                raise RuntimeError("MicroBatcher is closed")
            fut: Future = Future()
            self._q.put((np.asarray(image), modality, fut))
            return fut

    def close(self):
        with self._submit_lock:
            self._stop.set()
        self._thread.join(timeout=5)
        # fail anything still queued so no caller hangs on fut.result()
        while True:
            try:
                _, _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("MicroBatcher closed"))

    @staticmethod
    def _to_index(modality) -> int:
        """Accept the same per-request modality forms engine methods do."""
        if modality is None:
            return 0
        if isinstance(modality, str):
            from medvae_tpu.data.medmnist import modality_index

            return modality_index(modality)
        return int(np.asarray(modality).reshape(-1)[0])

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            import time as _time

            deadline = _time.monotonic() + self.max_delay
            while len(batch) < self.max_batch:
                left = deadline - _time.monotonic()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            # everything below is fallible (ragged shapes, bad modality
            # names): any error must land on the futures, never kill the
            # batcher thread
            try:
                mods = np.asarray(
                    [self._to_index(b[1]) for b in batch], np.int32
                )
                imgs = np.stack([b[0] for b in batch])
                out = self.engine.reconstruct(imgs, modality=mods)
                for i, (_, _, fut) in enumerate(batch):
                    fut.set_result(out[i])
            except Exception as e:
                for _, _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)
