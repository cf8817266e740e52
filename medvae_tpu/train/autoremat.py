"""Memory-guided activation-checkpoint selection: `model.remat: auto`.

Remat trades recompute FLOPs for HBM. Measured at 224² on v5e
(ops/PERF_224.md, scripts/probe_remat_memory.py): dropping remat when the
no-remat step fits is worth +12% step throughput (56.3 vs 50.1 img/s at
bs 32), while block remat is the difference between fitting and OOM at
larger batches. The right policy is therefore data-dependent — so instead
of hard-wiring "remat at ≥112²", `remat: auto` *measures*: it AOT-compiles
the production train step (same model/loss/optimizer/grad-accum/donation)
at each rung of a ladder — no remat → per-resblock ("block") → whole-codec
("full") — reads XLA's compile-time memory assignment, and picks the first
rung whose peak fits the device budget. Nothing is executed; a failing
rung costs one wasted compile, and the winning rung's compile lands in the
persistent XLA compilation cache so the real run's first step reuses it.

Budget resolution order: `device.memory_stats()["bytes_limit"]` (empty
through the axon tunnel), the `MEDVAE_HBM_BYTES` env override, then a
device-kind table. With no budget at all, a successful compile still
proves the step fits (XLA's TPU memory assignment is exact and fails
compilation otherwise), so the rung is accepted only when nothing else
(device caches) will also claim HBM.

The reference has no equivalent (it hand-pins batch size per config and
relies on torch's caching allocator); this is a TPU-native capability the
AOT compile model makes cheap.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional, Sequence

import numpy as np

from medvae_tpu.train.autobatch import is_oom_error

# XLA's own usable-HBM figure for the kind (from its RESOURCE_EXHAUSTED
# accounting), not the marketing capacity. Extend as kinds are measured.
KNOWN_USABLE_HBM = {
    "TPU v5 lite": int(15.75 * 2**30),  # v5e: "15.75G" in XLA OOM messages
    "TPU v4": int(30.75 * 2**30),
    "TPU v3": int(15.48 * 2**30),
}

# headroom for runtime allocations the AOT analysis cannot see: infeed
# buffers, fused multi-step chunk streaming, host-transfer staging
RUNTIME_GUARD_BYTES = 256 * 2**20

# probe ladder, cheapest-recompute first; "conv" is deliberately absent —
# measured a memory no-op with a scheduling penalty (ops/PERF_224.md)
DEFAULT_RUNGS: Sequence[Any] = (False, "block", "full")


def device_hbm_budget(device) -> Optional[int]:
    """Usable HBM bytes for `device`, or None when unknowable."""
    try:
        stats = device.memory_stats() or {}
    except Exception:  # noqa: BLE001 - backends without stats support
        stats = {}
    for key in ("bytes_limit", "bytes_reservable_limit"):
        if stats.get(key):
            return int(stats[key])
    env = os.environ.get("MEDVAE_HBM_BYTES")
    if env:
        return int(env)
    return KNOWN_USABLE_HBM.get(getattr(device, "device_kind", ""))


def compiled_peak_bytes(compiled) -> Optional[int]:
    """Peak HBM of an AOT-compiled executable: arguments + temporaries.

    Outputs alias donated arguments on TPU, so args+temps is the live peak
    during execution (validated against XLA OOM reports in PERF_224.md)."""
    ma = compiled.memory_analysis()
    if isinstance(ma, (list, tuple)):
        ma = ma[0] if ma else None
    if ma is None:
        return None
    try:
        return int(ma.temp_size_in_bytes) + int(ma.argument_size_in_bytes)
    except AttributeError:
        return None


def choose_remat(
    probe: Callable[[Any], Optional[int]],
    budget: Optional[int],
    reserve_bytes: int = 0,
    rungs: Sequence[Any] = DEFAULT_RUNGS,
    log: Callable[[str], None] = print,
    droppable_reserve: bool = False,
) -> tuple:
    """Pick the first rung whose probed peak fits; pure logic, test-injectable.

    Returns ``(rung, drop_reserve)``. `probe(rung)` returns the compiled
    peak in bytes, None when the compile succeeded but the peak is
    unreadable, and raises on compile failure (treated as "does not fit" —
    XLA TPU memory assignment happens at compile time). The last rung is the
    fallback and is never probed: it is what the non-auto default would have
    used anyway.

    `droppable_reserve=True` marks `reserve_bytes` as tradeable: it is the
    HBM the device-resident dataset caches would pin, and the trainer can
    stream batches from the host instead. Descending a remat rung costs
    recompute on every step (measured 35.6 -> 12 img/s on the 224² flagship,
    BENCH_FLAGSHIP_r05.json vs logs/disentangled_multi_modal_cvae_full/),
    while streaming costs one small host transfer per step (bs 32 at 224² is
    ~5 MB against a ~1 s step) — so when a rung fits only without the cache,
    keeping the rung and dropping the cache wins. ``drop_reserve=True`` in
    the result tells the caller to stream. Configs whose step fits alongside
    the cache (e.g. every 28² config, where the cache is worth 2.5× feed
    throughput) are unaffected: the with-cache check is tried first.
    """
    need_extra = int(reserve_bytes) + RUNTIME_GUARD_BYTES
    can_drop = droppable_reserve and int(reserve_bytes) > 0
    for rung in rungs[:-1]:
        try:
            peak = probe(rung)
        except Exception as e:  # noqa: BLE001 - any compile failure = no fit
            kind = "OOM" if is_oom_error(e) else "compile failure"
            log(
                f"autoremat: remat={rung!r} rejected ({kind}: "
                f"{str(e).splitlines()[0][:120]})"
            )
            continue
        if peak is None:
            # compile succeeded: the step alone provably fits. Accept only
            # when nothing else will claim HBM, since headroom is unknown.
            if int(reserve_bytes) == 0:
                log(f"autoremat: remat={rung!r} compiles (peak unreadable); selected")
                return rung, False
            if can_drop:
                log(
                    f"autoremat: remat={rung!r} compiles (peak unreadable); "
                    f"dropping the {reserve_bytes / 2**30:.2f} GiB device "
                    f"cache and streaming from host to keep this rung"
                )
                return rung, True
            log(
                f"autoremat: remat={rung!r} compiles but peak is unreadable "
                f"and {reserve_bytes / 2**30:.2f} GiB of caches are planned; "
                f"skipping"
            )
            continue
        if budget is not None and peak + need_extra > budget:
            if can_drop and peak + RUNTIME_GUARD_BYTES <= budget:
                log(
                    f"autoremat: remat={rung!r} peak {peak / 2**30:.2f} GiB "
                    f"fits {budget / 2**30:.2f} GiB only without the "
                    f"{reserve_bytes / 2**30:.2f} GiB device cache; keeping "
                    f"the faster rung and streaming batches from host"
                )
                return rung, True
            log(
                f"autoremat: remat={rung!r} peak {peak / 2**30:.2f} GiB "
                f"+ {need_extra / 2**30:.2f} GiB reserve exceeds "
                f"{budget / 2**30:.2f} GiB budget"
            )
            continue
        if budget is None and int(reserve_bytes) > 0:
            if can_drop:
                log(
                    f"autoremat: remat={rung!r} fits alone (budget unknown); "
                    f"dropping the planned device cache and streaming from "
                    f"host to keep this rung"
                )
                return rung, True
            log(
                f"autoremat: remat={rung!r} fits alone but the device budget "
                f"is unknown and caches are planned; skipping"
            )
            continue
        log(
            f"autoremat: remat={rung!r} selected "
            f"(peak {peak / 2**30:.2f} GiB"
            + (f" of {budget / 2**30:.2f} GiB" if budget is not None else "")
            + ")"
        )
        return rung, False
    log(f"autoremat: falling back to remat={rungs[-1]!r}")
    return rungs[-1], False


def synthetic_host_batch(datamodule, b: int) -> Dict[str, np.ndarray]:
    """A production-shaped host batch (uint8 images + routing metadata)."""
    from medvae_tpu.data.medmnist import MODALITY_NAMES

    size, c = datamodule.size, datamodule.max_channels
    midx = (np.arange(b) % len(MODALITY_NAMES)).astype(np.int32)
    return {
        "image_u8": np.zeros((b, size, size, c), np.uint8),
        "label": np.zeros((b,), np.int32),
        "modality_onehot": np.eye(len(MODALITY_NAMES), dtype=np.float32)[midx],
        "modality_idx": midx,
        "channels": np.full((b,), c, np.int32),
        "valid": np.ones((b,), np.float32),
    }


def recorded_remat_decision(ckpt_dir: str) -> tuple:
    """(remat rung, drop_device_cache) a previous launch resolved, or (None, False).

    The Trainer persists the `remat: auto` decision in trainer_state.json
    (keys "remat_rung": false | "block" | "full" and
    "device_cache_dropped": bool) so a RESUMED run reuses it instead of
    re-probing. Re-probing on resume is both slow (several AOT compiles per
    restart) and wrong: the device already holds the restored checkpoint,
    inflating the probe's apparent peak, so the same config can resolve a
    different (more conservative) rung than the fresh launch — i.e. the rung
    would be load-order dependent. The cache decision must travel with the
    rung: a rung chosen on the premise that batches stream from host would
    OOM if the resumed run re-pinned the dataset cache next to it.
    """
    import json
    import os

    path = os.path.join(ckpt_dir, "trainer_state.json")
    if not os.path.exists(path):
        return None, False
    try:
        with open(path) as f:
            blob = json.load(f)
    except (OSError, ValueError):
        return None, False
    rung = blob.get("remat_rung", None)
    if rung not in (False, "block", "full"):
        return None, False
    return rung, bool(blob.get("device_cache_dropped", False))


def recorded_remat_rung(ckpt_dir: str):
    """The remat rung a previous launch of this run resolved, or None."""
    return recorded_remat_decision(ckpt_dir)[0]


def probe_batch(datamodule, mesh, global_rows: Optional[int] = None):
    """A GLOBAL device probe batch at the datamodule's shapes.

    shard_batch's multi-process path treats its input as the LOCAL rows of
    the global batch (mirroring pipeline.py's per-host slicing), so the host
    batch must be sized per-host — or multi-host runs would compile a
    process_count-times oversized step and reject candidates that actually
    fit. Shared by the remat and batch-size probes; the 2-process regression
    lives in scripts/dcn_dryrun.py (tests/test_dcn.py drives it).
    """
    import jax

    from medvae_tpu.core.mesh import shard_batch

    b = int(global_rows if global_rows is not None else datamodule.batch_size)
    local_rows = max(b // jax.process_count(), 1)
    return shard_batch(mesh, synthetic_host_batch(datamodule, local_rows))


def resolve_auto_remat(
    make_model: Callable[[Any], Any],
    step_kwargs: Dict[str, Any],
    state,
    datamodule,
    mesh,
    seed_key,
    reserve_bytes: int = 0,
    rungs: Sequence[Any] = DEFAULT_RUNGS,
    log: Callable[[str], None] = print,
    droppable_reserve: bool = False,
):
    """Resolve `remat: auto` against the real device.

    Returns ``(remat, model, drop_reserve)`` — `drop_reserve=True` means the
    rung was chosen on the premise that the device-cache reserve will NOT be
    pinned (the trainer must stream batches from host; see choose_remat).

    `make_model(remat)` builds the run's model at a rung (remat wrappers are
    parameter-transparent, so the trainer's already-initialized variables
    stay valid). `step_kwargs` are the trainer's production
    `build_train_step` kwargs minus `model`. Probes run on the default
    device; non-TPU backends skip probing and use the fallback rung — CPU
    compiles never enforce a device memory budget, so a probe there proves
    nothing.
    """
    import jax

    from medvae_tpu.train.step import build_train_step

    device = jax.devices()[0]
    is_tpu = "tpu" in str(getattr(device, "platform", "")).lower() or str(
        getattr(device, "device_kind", "")
    ).startswith("TPU")
    if not is_tpu:
        log(
            f"autoremat: non-TPU backend ({device.platform}); using "
            f"remat={rungs[-1]!r} without probing"
        )
        return rungs[-1], make_model(rungs[-1]), False

    budget = device_hbm_budget(device)
    batch = probe_batch(datamodule, mesh)
    rng = jax.random.fold_in(seed_key, 98)
    models: Dict[Any, Any] = {}

    def probe(rung) -> Optional[int]:
        models[rung] = make_model(rung)
        step = build_train_step(model=models[rung], **step_kwargs)
        compiled = step.lower(state, batch, rng).compile()
        return compiled_peak_bytes(compiled)

    chosen, drop = choose_remat(
        probe, budget, reserve_bytes=reserve_bytes, rungs=rungs, log=log,
        droppable_reserve=droppable_reserve,
    )
    return chosen, models.get(chosen) or make_model(chosen), drop
