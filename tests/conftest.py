"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

This is the standard JAX way to exercise shard_map/pjit collective code without a
TPU pod (SURVEY.md §4): XLA's host platform is split into 8 virtual devices, so
the same Mesh/sharding code paths run as they would on a v5e-8 slice.
"""

import os
import sys

# Hard-set (the ambient environment may point JAX at a tunneled TPU backend;
# unit tests must run hermetically on the virtual CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Repo root on sys.path so `import medvae_tpu` works without installation.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# The environment may pre-register a remote TPU backend via sitecustomize and
# force jax_platforms at import time; override through the config API so the
# tests really run on the local virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: XLA compiles dominate test time on 1 CPU core.
# Set via the config API — the environment's sitecustomize imports jax before
# this file runs, so env vars are read too early to take effect.
jax.config.update("jax_compilation_cache_dir", "/tmp/medvae_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def config_dir():
    return os.path.join(_ROOT, "configs")


@pytest.fixture(scope="session")
def rng_key():
    import jax

    return jax.random.PRNGKey(0)
