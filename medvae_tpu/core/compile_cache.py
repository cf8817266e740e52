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

Known cosmetic noise: on CPU cache *hits*, XLA's AOT loader logs a machine-
feature mismatch error (it compares its own `prefer-no-scatter/gather`
tuning pseudo-features against cpuid). Same-host loads proceed correctly;
the message is spurious.
"""

from __future__ import annotations

import os
from typing import Optional

_enabled_dir: Optional[str] = None


def enable_compile_cache(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (idempotent).

    Returns the cache dir, or None when disabled via MEDVAE_COMPILE_CACHE=0.
    """
    global _enabled_dir
    if os.environ.get("MEDVAE_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return None
    path = (
        path
        or os.environ.get("MEDVAE_COMPILE_CACHE_DIR")
        or os.path.expanduser("~/.cache/medvae_tpu/xla")
    )
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
