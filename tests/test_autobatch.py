"""Automatic batch sizing: probe logic (unit) + data.batch_size=auto through
the full Trainer (integration).

The probe must find the EXACT largest fitting batch (in units of the mesh's
batch extent) via doubling + compile-budgeted binary search, only ever
swallow genuine OOM errors, never probe a candidate twice, and degrade
gracefully (largest verified size) when the probe budget runs out; the
Trainer must resolve `auto` before optimizer/scheduler construction so
steps_per_epoch is consistent with the probed size.
"""

import os

import numpy as np
import pytest

from medvae_tpu.train.autobatch import (

    is_oom_error,
    probe_max_batch_size,
    resolve_auto_batch_size,
)

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow


class FakeOOM(Exception):
    def __str__(self):
        return "RESOURCE_EXHAUSTED: Out of memory while trying to allocate"


def _try_fn_with_limit(limit, calls):
    def try_fn(b):
        calls.append(b)
        if b > limit:
            raise FakeOOM()
    return try_fn


def test_is_oom_error_classification():
    assert is_oom_error(FakeOOM())
    assert is_oom_error(RuntimeError("Resource exhausted: HBM"))
    assert not is_oom_error(ValueError("shape mismatch"))


def test_probe_finds_exact_maximum():
    """Binary search converges to the true maximum (multiple=1 → exact)."""
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(700, calls), start=64, max_batch=4096,
        log=lambda *_: None,
    )
    assert got == 700
    assert calls[:5] == [64, 128, 256, 512, 1024]  # doubling phase
    assert len(calls) == len(set(calls))  # no candidate probed twice
    assert len(calls) <= 16


def test_probe_exact_in_multiple_units():
    """With a mesh batch extent, the result is the largest fitting multiple —
    within one `multiple` step of the true maximum, per the search contract."""
    for limit in (700, 800, 1023, 1025):
        calls = []
        got = probe_max_batch_size(
            _try_fn_with_limit(limit, calls), start=64, max_batch=4096,
            multiple=8, log=lambda *_: None,
        )
        assert got == (limit // 8) * 8, f"limit={limit}: got {got}"
        assert all(b % 8 == 0 for b in calls)
        assert len(calls) == len(set(calls))


def test_probe_budget_bounds_compiles_and_degrades_gracefully():
    """When max_probes is hit mid-bisection the probe returns the largest
    VERIFIED size (never an untested one) and stops compiling."""
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(700, calls), start=64, max_batch=4096,
        max_probes=7, log=lambda *_: None,
    )
    assert len(calls) == 7
    assert 512 <= got <= 700  # verified, and at least the doubling-phase best
    assert got in calls  # never returns an unprobed size
    # the budget is a hard compile cap — it bounds the doubling phase too,
    # returning the largest size verified within budget
    calls2 = []
    got2 = probe_max_batch_size(
        _try_fn_with_limit(700, calls2), start=64, max_batch=4096,
        max_probes=1, log=lambda *_: None,
    )
    assert got2 == 64 and calls2 == [64]


def test_probe_backs_off_when_start_ooms():
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(100, calls), start=512, max_batch=4096, multiple=8,
        log=lambda *_: None,
    )
    assert got <= 100 and got % 8 == 0
    assert calls[0] == 512  # started high, backed off


def test_probe_respects_cap_and_multiple():
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(10**9, calls), start=48, max_batch=256, multiple=16,
        log=lambda *_: None,
    )
    assert got == 256  # cap reached without failure
    assert all(b % 16 == 0 for b in calls)


def test_probe_start_clamped_to_cap():
    """Regression: start > max_batch must not probe (or return) above the
    cap — small autobatch_max or tiny datasets bound the first candidate."""
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(10**9, calls), start=64, max_batch=32, multiple=16,
        log=lambda *_: None,
    )
    assert got == 32
    assert max(calls) <= 32


def test_probe_propagates_non_oom_errors():
    def try_fn(b):
        raise ValueError("a real bug")
    with pytest.raises(ValueError, match="a real bug"):
        probe_max_batch_size(try_fn, start=64, log=lambda *_: None)


def test_probe_raises_when_nothing_fits():
    def try_fn(b):
        raise FakeOOM()
    with pytest.raises(MemoryError):
        probe_max_batch_size(try_fn, start=64, multiple=4, log=lambda *_: None)


def test_trainer_resolves_auto_batch_size(tmp_path, config_dir):
    """End to end: data.batch_size=auto -> probed size, training runs."""
    from medvae_tpu.config import compose
    from medvae_tpu.train.trainer import Trainer

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=chest_base_vae_quick",
            "device=cpu",
            f"work_dir={tmp_path}",
            "data.batch_size=auto",
            "+training.autobatch_start=32",
            "+training.autobatch_max=128",   # CPU-safe cap
            "training.max_epochs=1",
            "+training.limit_train_batches=1",
            "early_stopping.enabled=false",
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
        ],
    )
    trainer = Trainer(cfg)
    bs = int(trainer.datamodule.batch_size)
    assert 32 <= bs <= 128
    # the probe held the projected device-cache footprint as ballast so the
    # chosen size still fits once the train/val/test caches are pinned
    assert trainer._projected_cache_bytes() > 0
    # steps_per_epoch consistent with the probed size
    n = len(trainer.datamodule.train_arrays)
    assert trainer.steps_per_epoch == max(1, n // bs)
    val = trainer.fit()
    assert np.isfinite(val["val/loss"])


def test_trainer_resolves_auto_batch_size_gan(tmp_path, config_dir):
    """Regression: the probe must force execution via the GAN step's metric
    key (train/total_loss — gan_train_step logs no train/loss), so
    data.batch_size=auto works for lpips_discriminator configs too."""
    from medvae_tpu.config import compose
    from medvae_tpu.train.trainer import Trainer

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=multi_modal_cvae_gan_quick",
            "device=cpu",
            f"work_dir={tmp_path}",
            "data.batch_size=auto",
            "+training.autobatch_start=8",
            "+training.autobatch_max=16",   # CPU-safe cap
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
        ],
    )
    trainer = Trainer(cfg)  # probe runs here; KeyError would abort it
    assert 8 <= int(trainer.datamodule.batch_size) <= 16


def test_probe_no_reprobe_after_downward_bracket():
    """Regression: start OOMs, halving finds a fit — the search must go
    straight to bisection, not re-probe the size that just failed (each
    probe is a full XLA compile)."""
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(40, calls), start=64, max_batch=4096, multiple=8,
        log=lambda *_: None,
    )
    assert got == 40
    assert len(calls) == len(set(calls)), f"re-probed a candidate: {calls}"


def test_probe_budget_bounds_doubling_phase():
    """max_probes caps the doubling phase too, not just bisection."""
    calls = []
    got = probe_max_batch_size(
        _try_fn_with_limit(10**9, calls), start=8, max_batch=2**20,
        multiple=8, max_probes=3, log=lambda *_: None,
    )
    assert got == 32  # 8, 16, 32 — then budget reached
    assert len(calls) == 3
