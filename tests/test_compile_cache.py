"""Persistent compilation cache wiring (core/compile_cache.py): enabled at
package import, machine-signature scoped, idempotent, env-disable honored,
and actually populated by a jitted computation (so supervisor relaunches /
CLI reruns skip compiles)."""

import os

import jax


def test_cache_enabled_at_import():
    # conftest imports medvae_tpu before jax init; the package enables the
    # cache unless MEDVAE_COMPILE_CACHE=0
    import medvae_tpu  # noqa: F401

    assert jax.config.jax_compilation_cache_dir, "cache dir not configured"


def test_machine_signature_scoping(tmp_path):
    """Entries live under <base>/<machine-signature>: a different machine
    (or jax upgrade) gets a sibling directory, never stale loads."""
    from medvae_tpu.core import compile_cache

    sig = compile_cache.machine_signature()
    assert sig == compile_cache.machine_signature()  # stable
    assert len(sig) == 12

    d = str(tmp_path / "xla")
    got = compile_cache.enable_compile_cache(d)
    assert got == os.path.join(d, sig)
    compile_cache.enable_compile_cache()  # restore the default dir


def test_enable_is_idempotent_and_env_disable(tmp_path, monkeypatch):
    from medvae_tpu.core import compile_cache

    d = str(tmp_path / "xla")
    got = compile_cache.enable_compile_cache(d)
    assert got and got.startswith(d)
    assert compile_cache.enable_compile_cache(d) == got  # no-op second time
    assert jax.config.jax_compilation_cache_dir == got

    monkeypatch.setenv("MEDVAE_COMPILE_CACHE", "0")
    assert compile_cache.enable_compile_cache(str(tmp_path / "other")) is None
    assert jax.config.jax_compilation_cache_dir == got  # unchanged
    compile_cache.enable_compile_cache()  # restore the default dir


def test_cache_populated_by_jit(tmp_path):
    from medvae_tpu.core import compile_cache

    d = compile_cache.enable_compile_cache(str(tmp_path / "xla2"))
    try:
        # force-persist even sub-second compiles so the test is fast
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        import jax.numpy as jnp

        jax.jit(lambda x: jnp.sin(x) * 3 + 1)(jnp.arange(7.0)).block_until_ready()
        entries = [f for f in os.listdir(d) if not f.endswith("-atime")]
        assert entries, "no cache entries written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        compile_cache.enable_compile_cache()  # restore the default dir


def test_disable_compile_cache(tmp_path):
    """One-shot artifact runs (driver dryrun) can switch the cache off so
    XLA's spurious cpu_aot_loader errors on CPU hits can't bury stdout."""
    from medvae_tpu.core import compile_cache

    compile_cache.enable_compile_cache(str(tmp_path / "xla3"))
    compile_cache.disable_compile_cache()
    try:
        assert not jax.config.jax_enable_compilation_cache
    finally:
        jax.config.update("jax_enable_compilation_cache", True)
        compile_cache.enable_compile_cache()  # restore the default dir


def test_setup_failure_degrades_gracefully(tmp_path, monkeypatch):
    """A host-side cache failure (unwritable dir, malformed env) must warn
    and return None — never break `import medvae_tpu`."""
    import warnings

    from medvae_tpu.core import compile_cache

    monkeypatch.setenv("MEDVAE_COMPILE_CACHE_MAX_BYTES", "2GB")  # malformed
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = compile_cache.enable_compile_cache(str(tmp_path / "x"))
    assert got is None
    assert any("compilation cache disabled" in str(x.message) for x in w)
    compile_cache.enable_compile_cache()  # restore the default dir
