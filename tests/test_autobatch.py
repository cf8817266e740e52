"""Automatic batch sizing: probe logic (unit) + data.batch_size=auto through
the full Trainer (integration).

The probe must find the largest fitting batch with doubling + one midpoint
refinement, only ever swallow genuine OOM errors, and round to the mesh's
batch extent; the Trainer must resolve `auto` before optimizer/scheduler
construction so steps_per_epoch is consistent with the probed size.
"""

import os

import numpy as np
import pytest

from medvae_tpu.train.autobatch import (
    is_oom_error,
    probe_max_batch_size,
    resolve_auto_batch_size,
)


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


def test_probe_doubles_then_refines():
    calls = []
    # limit 700: 64,128,256,512 fit; 1024 OOM; midpoint (512+1024)//2=768 OOM
    got = probe_max_batch_size(
        _try_fn_with_limit(700, calls), start=64, max_batch=4096,
        log=lambda *_: None,
    )
    assert got == 512
    assert calls == [64, 128, 256, 512, 1024, 768]


def test_probe_midpoint_refinement_wins():
    calls = []
    # limit 800: ... 512 fits, 1024 OOM, midpoint 768 fits -> 768
    got = probe_max_batch_size(
        _try_fn_with_limit(800, calls), start=64, max_batch=4096,
        log=lambda *_: None,
    )
    assert got == 768


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
