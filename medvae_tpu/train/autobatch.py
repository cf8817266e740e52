"""Automatic batch sizing: probe the largest batch that fits device memory.

New capability beyond the reference (which hand-pins batch_size per config;
README roadmap item "per-resolution batch auto-sizing"). `data.batch_size=auto`
makes the Trainer probe with the REAL jitted train step — same model, loss,
optimizer-state footprint, remat policy — doubling until the device reports
RESOURCE_EXHAUSTED, then binary-searching the bracket to the exact maximum
(in units of the mesh's batch extent) under a total compile budget
(`training.autobatch_probes`, default 16 candidates).

Each candidate costs one XLA compile (~20-40 s on a tunneled TPU), so the
probe is opt-in, logs its trajectory, and is bounded by `max_batch` and the
dataset size. Memory-relevant knobs (resolution, remat, loss type, EMA,
optimizer) are all captured because the probe runs the production step; the
result is only valid for that configuration.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional


def is_oom_error(e: BaseException) -> bool:
    """True when an exception is a device out-of-memory failure."""
    msg = str(e)
    return any(
        s in msg
        for s in (
            "RESOURCE_EXHAUSTED",
            "Out of memory",
            "out of memory",
            "OOM",
            "Resource exhausted",
            "exceeds the amount of memory available",
        )
    )


def probe_max_batch_size(
    try_fn: Callable[[int], None],
    start: int = 64,
    max_batch: int = 65536,
    multiple: int = 1,
    log: Callable[[str], None] = print,
    max_probes: int = 16,
) -> int:
    """Largest b (multiple of `multiple`, ≤ max_batch) for which try_fn(b)
    does not OOM.

    try_fn runs one real step at batch b and raises on failure; OOM errors
    (is_oom_error) shrink the search, any other exception propagates.
    Strategy: double from `start` until failure or cap, then binary-search
    the (last success, first failure) bracket down to `multiple` granularity
    — i.e. the exact maximum in units of `multiple` — subject to a total
    compile budget of `max_probes` try_fn calls (each candidate costs one XLA
    compile). When the budget runs out mid-bisection the largest verified
    size is returned; the bracket halves every probe, so even a tight budget
    lands within bracket/2^k of the true maximum. No candidate is ever
    probed twice.
    """
    def _round(b: int) -> int:
        return max(multiple, (b // multiple) * multiple)

    probes = 0

    def attempt(b: int) -> bool:
        nonlocal probes
        probes += 1
        try:
            try_fn(b)
            log(f"autobatch: {b} fits")
            return True
        except Exception as e:  # noqa: BLE001 - filtered by is_oom_error
            if not is_oom_error(e):
                raise
            log(f"autobatch: {b} OOM")
            return False

    # start must respect the cap: with max_batch below the default start
    # (small autobatch_max or a tiny dataset) the first probe would otherwise
    # try — and possibly return — a size above the configured bound
    start = _round(min(start, max_batch))
    good: Optional[int] = None
    bad: Optional[int] = None
    b = start
    while True:
        if attempt(b):
            good = b
            if b >= max_batch:
                log(f"autobatch: selected {good} (cap)")
                return _round(b)
            if bad is not None:
                break  # downward search succeeded: bracket (good, bad) known
            if probes >= max_probes:
                log(
                    f"autobatch: probe budget ({max_probes}) reached while "
                    f"doubling; keeping {good}"
                )
                return good
            b = min(b * 2, max_batch)
        else:
            bad = b
            if good is not None:
                break
            # good is still unknown: keep halving past the budget — returning
            # nothing is not an option, and each halving is the cheapest
            # candidate that can possibly fit
            if b <= multiple:
                raise MemoryError(
                    f"even batch {b} does not fit device memory"
                )
            b = _round(max(multiple, b // 2))
    # bisect the bracket to exact `multiple` granularity, compile-bounded
    while bad - good > multiple and probes < max_probes:
        mid = _round((good + bad) // 2)
        if mid <= good or mid >= bad:
            break
        if attempt(mid):
            good = mid
        else:
            bad = mid
    if bad - good > multiple:
        log(
            f"autobatch: probe budget ({max_probes}) reached with bracket "
            f"({good}, {bad}); keeping {good}"
        )
    log(f"autobatch: selected {good}")
    return good


def resolve_auto_batch_size(
    model,
    datamodule,
    mesh,
    loss_cfg: dict,
    params,
    seed_key,
    frozen=None,
    disc=None,
    disc_vars=None,
    start: int = 64,
    max_batch: int = 65536,
    max_probes: int = 16,
    ballast_bytes: int = 0,
    log: Callable[[str], None] = print,
) -> int:
    """Probe with the production train step (build_train_step) on synthetic
    device batches; returns the chosen global batch size.

    The probe state carries the run's full memory footprint — frozen
    perceptual nets and the GAN discriminator (params + its optimizer slots)
    when configured — so the selected size holds for the real run.
    `ballast_bytes` is held as a device allocation for the probe's duration:
    the Trainer passes the projected device-cache footprint (pinned AFTER
    batch sizing) so the chosen size still fits once the caches land."""
    import jax
    import optax

    from medvae_tpu.core.mesh import DATA_AXIS, DCN_AXIS, replicate
    from medvae_tpu.train.autoremat import probe_batch
    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.step import build_train_step

    n_data = int(mesh.shape[DATA_AXIS]) * int(mesh.shape.get(DCN_AXIS, 1))
    n_train = len(datamodule.train_arrays)
    cap = min(int(max_batch), max(n_data, (n_train // n_data) * n_data))

    # memory-faithful probe optimizer: adam's m/v slots like the real run
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-4))
    disc_tx = tx if disc is not None else None
    # donate=False: donation would consume the shared `params` buffers on the
    # first probe call (the Trainer still needs them). Probing without
    # donation holds input+output state simultaneously — i.e. it OVERestimates
    # the real (donating) run's memory, so the chosen size errs safe.
    step = build_train_step(
        model, dict(loss_cfg), tx, mesh,
        augment=bool(getattr(datamodule, "augment_train", False)),
        normalize=True,
        max_channels=datamodule.max_channels,
        disc=disc, disc_tx=disc_tx,
        donate=False,
    )
    rng = jax.random.fold_in(seed_key, 99)

    ballast = None
    if ballast_bytes > 0:
        from medvae_tpu.core.mesh import data_sharding

        nb = ((int(ballast_bytes) + n_data - 1) // n_data) * n_data
        ballast = jax.jit(
            lambda: jax.numpy.zeros((nb,), jax.numpy.uint8),
            out_shardings=data_sharding(mesh, 1),
        )()
        ballast.block_until_ready()
        log(f"autobatch: holding {nb / 1e6:.0f} MB cache ballast during probe")

    def try_fn(b: int) -> None:
        # b is the GLOBAL candidate; probe_batch assembles it from per-host
        # local rows (multi-host: a global-sized host batch would compile a
        # process_count-times oversized step and under-select the size)
        batch = probe_batch(datamodule, mesh, global_rows=b)
        # fresh state per candidate: the step donates its input state
        state = replicate(
            mesh,
            create_train_state(
                params, tx, frozen=frozen or {}, disc_variables=disc_vars,
                disc_tx=disc_tx,
            ),
        )
        new_state, metrics = step(state, batch, rng)
        # force execution; the GAN step logs train/total_loss, not train/loss
        key = "train/loss" if "train/loss" in metrics else "train/total_loss"
        float(jax.device_get(metrics[key]))
        del new_state

    try:
        return probe_max_batch_size(
            try_fn, start=start, max_batch=cap, multiple=n_data, log=log,
            max_probes=max_probes,
        )
    finally:
        del ballast  # free before the real caches allocate
