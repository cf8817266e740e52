"""Persistent XLA compilation cache — compile once, relaunch for free.

The reference has no compile step to cache (eager torch). Here every jitted
program is compiled by XLA, and on the production path that cost is real:
a 224² full-flagship train step takes tens of minutes to compile through a
remote-compile service, and the resilient supervisor
(scripts/train_resilient.py) relaunches crashed runs in a fresh process —
which would repay the full compile on every restart. JAX's persistent
compilation cache stores serialized executables keyed by (HLO, compile
options, backend version), so a relaunch with unchanged code hits the cache
and starts stepping immediately; any code/shape change re-keys automatically
(no staleness risk). The same cache makes repeat CPU test runs and repeated
CLI invocations (generate/evaluate/analyze on one checkpoint) skip their
jit costs.

Enabled once at package import (medvae_tpu/__init__.py). Controls:
  MEDVAE_COMPILE_CACHE=0        disable entirely
  MEDVAE_COMPILE_CACHE_DIR=...  cache location (default ~/.cache/medvae_tpu/xla)

Backends that cannot serialize executables are skipped gracefully (JAX warns
and compiles as usual — jax_raise_persistent_cache_errors stays False).

Entries are scoped under a per-machine-signature subdirectory
(jax version + backend machine + CPU feature hash), so moving the cache
directory between hosts — or a driver image change — produces clean misses
instead of stale cross-machine loads.

Known cosmetic noise: on CPU cache *hits*, XLA's AOT loader logs a machine-
feature mismatch error even same-host (it records `prefer-no-scatter/gather`
tuning pseudo-features at compile time and compares them against raw cpuid
at load). Loads proceed correctly; the message is spurious. One-shot
correctness artifacts (the driver's multichip dryrun) therefore disable the
cache via `disable_compile_cache()` — a hit saves nothing there and the
spam would bury the artifact's signal.
"""

from __future__ import annotations

import hashlib
import os
import platform as _platform
from typing import Optional

_enabled_dir: Optional[str] = None


def machine_signature() -> str:
    """Short stable signature of (jax version, arch, CPU feature set).

    Used to scope persistent-cache entries: a different machine (or jax/XLA
    upgrade) gets a sibling cache directory, so stale entries compiled under
    another signature are never even candidates for loading."""
    import jax

    parts = [jax.__version__, _platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(_platform.processor() or "")
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    Returns the cache dir, or None when disabled via MEDVAE_COMPILE_CACHE=0.
    """
    global _enabled_dir
    if os.environ.get("MEDVAE_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    base = (
        path
        or os.environ.get("MEDVAE_COMPILE_CACHE_DIR")
        or os.path.expanduser("~/.cache/medvae_tpu/xla")
    )
    try:
        path = os.path.join(base, machine_signature())
    except Exception:  # noqa: BLE001 - signature is best-effort scoping
        path = base
    if _enabled_dir == path:
        return path

    import jax

    # The cache is a pure optimization: a host-side setup failure (read-only
    # $HOME in a container, malformed env var) must never break package
    # import — warn and run uncached instead.
    try:
        # parse/validate before mutating any jax config
        # Optional LRU size bound. Off by default: the LRU bookkeeping writes
        # per-entry atime files, which race (noisy warnings) when several
        # processes share the cache — our normal mode (supervisor + tests).
        max_bytes = int(os.environ.get("MEDVAE_COMPILE_CACHE_MAX_BYTES", "0"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default only persists compiles >1s wall — the ones worth keeping
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if max_bytes > 0:
            jax.config.update("jax_compilation_cache_max_size", max_bytes)
        if _enabled_dir is not None and _enabled_dir != path:
            # the cache object latches its directory on first use; re-point
            # an already-initialized cache (tests, notebooks) explicitly
            from jax.experimental.compilation_cache import (
                compilation_cache as _cc,
            )

            _cc.reset_cache()
    except Exception as e:  # noqa: BLE001 — degrade to uncached compiles
        import warnings

        warnings.warn(
            f"persistent compilation cache disabled ({type(e).__name__}: {e})"
        )
        _enabled_dir = None
        return None
    _enabled_dir = path
    return path


def disable_compile_cache() -> None:
    """Turn the persistent cache off for this process (idempotent).

    For one-shot runs whose stdout is the artifact (the driver's multichip
    dryrun): a cache hit saves nothing there, and XLA's spurious
    cpu_aot_loader machine-feature errors on CPU hits would bury the
    artifact's `ok` lines."""
    global _enabled_dir
    import jax

    try:
        jax.config.update("jax_enable_compilation_cache", False)
    except Exception:  # noqa: BLE001 - older jax without the flag
        jax.config.update("jax_compilation_cache_dir", None)
    _enabled_dir = None
