"""remat='auto' — memory-guided activation-checkpoint selection.

Covers the pure ladder logic (choose_remat), budget resolution, the
build_model 'auto'→'full' safe resolution outside the Trainer, and the
non-TPU short-circuit of resolve_auto_remat. The on-device AOT probing
itself is validated by scripts/probe_remat_memory.py on real hardware
(measured table in ops/PERF_224.md)."""

import jax
import pytest

from medvae_tpu.models import BaseVAE
from medvae_tpu.train.autoremat import (
    RUNTIME_GUARD_BYTES,
    choose_remat,
    device_hbm_budget,
    resolve_auto_remat,
)
from medvae_tpu.train.trainer import build_model

GIB = 2**30
QUIET = lambda _msg: None  # noqa: E731


def make_probe(peaks):
    """probe(rung) from a {rung: peak_bytes | Exception | None} table."""
    calls = []

    def probe(rung):
        calls.append(rung)
        v = peaks[rung]
        if isinstance(v, Exception):
            raise v
        return v

    probe.calls = calls
    return probe


def test_first_fitting_rung_wins():
    probe = make_probe({False: 10 * GIB, "block": 8 * GIB})
    chosen, drop = choose_remat(probe, budget=15 * GIB, log=QUIET)
    assert chosen is False and drop is False
    assert probe.calls == [False]  # later rungs never compiled


def test_oom_compile_falls_through_to_next_rung():
    probe = make_probe(
        {False: RuntimeError("RESOURCE_EXHAUSTED: ..."), "block": 8 * GIB}
    )
    assert choose_remat(probe, budget=15 * GIB, log=QUIET) == ("block", False)


def test_generic_compile_failure_is_a_rejection_not_a_crash():
    # the tunneled compiler surfaces compile-time OOM as an opaque HTTP 500
    probe = make_probe(
        {False: RuntimeError("INTERNAL: HTTP 500"), "block": 8 * GIB}
    )
    assert choose_remat(probe, budget=15 * GIB, log=QUIET) == ("block", False)


def test_budget_includes_reserve_and_guard():
    budget = 15 * GIB
    peak = budget - RUNTIME_GUARD_BYTES - 1 * GIB
    probe = make_probe({False: peak, "block": 1 * GIB})
    # fits with no reserve…
    assert choose_remat(probe, budget, reserve_bytes=0, log=QUIET) == (False, False)
    # …but a planned 2 GiB device cache pushes it over
    probe2 = make_probe({False: peak, "block": 1 * GIB})
    assert (
        choose_remat(probe2, budget, reserve_bytes=2 * GIB, log=QUIET)
        == ("block", False)
    )


def test_unreadable_peak_accepted_only_without_reserve():
    probe = make_probe({False: None})
    assert choose_remat(probe, budget=None, reserve_bytes=0, log=QUIET) == (False, False)
    probe2 = make_probe({False: None, "block": None})
    assert (
        choose_remat(probe2, budget=None, reserve_bytes=1, log=QUIET)
        == ("full", False)
    )


def test_unknown_budget_with_reserve_falls_back():
    probe = make_probe({False: 1 * GIB, "block": 1 * GIB})
    assert choose_remat(probe, budget=None, reserve_bytes=1, log=QUIET) == ("full", False)


def test_all_rungs_rejected_uses_fallback_unprobed():
    probe = make_probe(
        {False: RuntimeError("OOM"), "block": RuntimeError("OOM")}
    )
    assert choose_remat(probe, budget=15 * GIB, log=QUIET) == ("full", False)
    assert "full" not in probe.calls


class FakeDevice:
    def __init__(self, stats=None, kind="TPU v5 lite", platform="tpu"):
        self._stats = stats
        self.device_kind = kind
        self.platform = platform

    def memory_stats(self):
        return self._stats


def test_budget_prefers_memory_stats():
    dev = FakeDevice(stats={"bytes_limit": 123})
    assert device_hbm_budget(dev) == 123


def test_budget_env_override(monkeypatch):
    monkeypatch.setenv("MEDVAE_HBM_BYTES", str(7 * GIB))
    assert device_hbm_budget(FakeDevice(stats={})) == 7 * GIB


def test_budget_kind_table():
    assert device_hbm_budget(FakeDevice(stats={})) == int(15.75 * GIB)
    assert device_hbm_budget(FakeDevice(stats={}, kind="TPU v99")) is None


def test_resolve_short_circuits_on_non_tpu():
    # the test mesh is CPU: no probing, fallback rung, state untouched
    assert jax.devices()[0].platform == "cpu"
    built = []
    chosen, model, drop = resolve_auto_remat(
        make_model=lambda r: built.append(r) or ("model", r),
        step_kwargs=None,  # would crash if probing were attempted
        state=None,
        datamodule=None,
        mesh=None,
        seed_key=None,
        log=QUIET,
    )
    assert chosen == "full" and model == ("model", "full") and drop is False
    assert built == ["full"]


class _FakeTPU:
    """Stands in for jax.devices()[0] so the probe path runs on CPU."""

    platform = "tpu"
    device_kind = "TPU v5 lite"

    def __init__(self, bytes_limit):
        self._bytes_limit = bytes_limit

    def memory_stats(self):
        return {"bytes_limit": self._bytes_limit}


class _FakeDataModule:
    size = 28
    max_channels = 3
    batch_size = 16


def _probe_harness(monkeypatch, peaks, budget, reserve_bytes=0,
                   droppable_reserve=False):
    """Drive resolve_auto_remat's real probing path end-to-end on CPU:
    fake TPU device, stubbed build_train_step whose AOT 'compile' reports
    the given per-rung peaks. Returns (chosen, model, drop, captured)."""
    import jax as _jax

    from medvae_tpu.core.mesh import MeshSpec, create_mesh
    import medvae_tpu.train.step as step_mod

    monkeypatch.setattr(
        _jax, "devices", lambda *a, **k: [_FakeTPU(budget)]
    )
    captured = {"models": [], "batches": [], "kwargs": []}

    class _FakeCompiled:
        def __init__(self, peak):
            self._peak = peak

        def memory_analysis(self):
            class MA:
                temp_size_in_bytes = self._peak
                argument_size_in_bytes = 0

            return MA()

    class _FakeLowered:
        def __init__(self, peak):
            self._peak = peak

        def compile(self):
            v = self._peak
            if isinstance(v, Exception):
                raise v
            return _FakeCompiled(v)

    def fake_build_train_step(model, **kwargs):
        captured["models"].append(model)
        captured["kwargs"].append(kwargs)

        def lower(state, batch, rng):
            captured["batches"].append(batch)
            return _FakeLowered(peaks[model[1]])  # model == ("m", rung)

        return type("S", (), {"lower": staticmethod(lower)})()

    monkeypatch.setattr(step_mod, "build_train_step", fake_build_train_step)
    # mesh on the real CPU device (jax.local_devices is left unpatched)
    mesh = create_mesh(MeshSpec(data=1, model=1), [_jax.local_devices()[0]])
    chosen, model, drop = resolve_auto_remat(
        make_model=lambda r: ("m", r),
        step_kwargs={"loss_cfg": {"type": "vae"}},
        state=None,
        datamodule=_FakeDataModule(),
        mesh=mesh,
        seed_key=jax.random.key(0),
        reserve_bytes=reserve_bytes,
        log=QUIET,
        droppable_reserve=droppable_reserve,
    )
    return chosen, model, drop, captured


def test_probe_path_selects_no_remat_when_it_fits(monkeypatch):
    chosen, model, drop, cap = _probe_harness(
        monkeypatch, peaks={False: 4 * GIB}, budget=16 * GIB
    )
    assert chosen is False and model == ("m", False) and drop is False
    # only the winning rung was compiled; the production kwargs flowed through
    assert [m[1] for m in cap["models"]] == [False]
    assert cap["kwargs"][0] == {"loss_cfg": {"type": "vae"}}
    # the probe batch is production-shaped and device-resident
    b = cap["batches"][0]
    assert b["image_u8"].shape == (16, 28, 28, 3)
    assert b["modality_onehot"].shape[0] == 16
    assert isinstance(b["image_u8"], jax.Array)


def test_probe_path_reserve_forces_cheaper_rung(monkeypatch):
    # 14 GiB step fits 16 GiB alone but not once 3 GiB of caches land
    chosen, model, drop, cap = _probe_harness(
        monkeypatch,
        peaks={False: 14 * GIB, "block": 10 * GIB},
        budget=16 * GIB,
        reserve_bytes=3 * GIB,
    )
    assert chosen == "block" and model == ("m", "block") and drop is False
    assert [m[1] for m in cap["models"]] == [False, "block"]


def test_probe_path_compile_oom_falls_through(monkeypatch):
    chosen, model, drop, _ = _probe_harness(
        monkeypatch,
        peaks={False: RuntimeError("RESOURCE_EXHAUSTED"), "block": 8 * GIB},
        budget=16 * GIB,
    )
    assert chosen == "block" and model == ("m", "block") and drop is False


MODEL_CFG = dict(
    _target_="medvae_tpu.models.BaseVAE",
    input_channels=1,
    latent_dim=16,
    hidden_channels=32,
    ch_mult=[1, 2, 4],
    num_res_blocks=1,
    attn_resolutions=[],
    resolution=224,
)


def test_build_model_resolves_auto_to_full_outside_trainer():
    m = build_model(dict(MODEL_CFG, remat="auto"))
    assert isinstance(m, BaseVAE) and m.remat == "full"


def test_build_model_high_resolution_default_is_full():
    assert build_model(dict(MODEL_CFG)).remat == "full"
    low = dict(MODEL_CFG, resolution=28, attn_resolutions=[])
    assert build_model(low).remat is False


def test_build_model_remat_override_beats_config():
    m = build_model(dict(MODEL_CFG, remat="auto"), remat=False)
    assert m.remat is False
    m2 = build_model(dict(MODEL_CFG, remat="block"), remat="full")
    assert m2.remat == "full"


def test_recorded_remat_rung_roundtrip(tmp_path):
    """Resume reuses the persisted rung instead of re-probing (the probe is
    load-order dependent once a restored checkpoint occupies the device)."""
    import json

    from medvae_tpu.train.autoremat import recorded_remat_rung

    d = str(tmp_path)
    assert recorded_remat_rung(d) is None  # no trainer_state.json yet

    path = tmp_path / "trainer_state.json"
    for rung in (False, "block", "full"):
        path.write_text(json.dumps({"remat_rung": rung, "early_stopping": {}}))
        assert recorded_remat_rung(d) == rung

    path.write_text(json.dumps({"early_stopping": {"best": 1.0}}))
    assert recorded_remat_rung(d) is None  # older runs: key absent

    path.write_text(json.dumps({"remat_rung": "bogus"}))
    assert recorded_remat_rung(d) is None  # unknown value ignored

    path.write_text("{not json")
    assert recorded_remat_rung(d) is None  # corrupt file ignored


def test_droppable_reserve_keeps_the_faster_rung():
    """The flagship 224² case: no-remat fits the budget only without the
    device cache. With droppable_reserve the planner keeps the fast rung and
    tells the caller to stream batches from host instead of descending to a
    recompute-heavy rung (measured 35.6 vs 12 img/s,
    BENCH_FLAGSHIP_r05.json vs logs/disentangled_multi_modal_cvae_full/)."""
    budget = 16 * GIB
    peak = budget - RUNTIME_GUARD_BYTES - 1 * GIB  # fits alone, not +2 GiB
    probe = make_probe({False: peak, "block": 1 * GIB})
    assert choose_remat(
        probe, budget, reserve_bytes=2 * GIB, log=QUIET, droppable_reserve=True
    ) == (False, True)
    assert probe.calls == [False]  # never descended the ladder

    # with the cache fitting alongside, it is kept (28² configs: the cache
    # is worth 2.5x feed throughput there)
    probe2 = make_probe({False: 4 * GIB, "block": 1 * GIB})
    assert choose_remat(
        probe2, budget, reserve_bytes=2 * GIB, log=QUIET, droppable_reserve=True
    ) == (False, False)


def test_droppable_reserve_unknown_budget_and_unreadable_peak():
    # budget unknown, peak readable: compile proves the step fits alone
    probe = make_probe({False: 1 * GIB})
    assert choose_remat(
        probe, budget=None, reserve_bytes=1, log=QUIET, droppable_reserve=True
    ) == (False, True)
    # peak unreadable: same reasoning
    probe2 = make_probe({False: None})
    assert choose_remat(
        probe2, budget=None, reserve_bytes=1, log=QUIET, droppable_reserve=True
    ) == (False, True)
    # droppable with zero reserve behaves exactly like the plain path
    probe3 = make_probe({False: 1 * GIB})
    assert choose_remat(
        probe3, budget=16 * GIB, reserve_bytes=0, log=QUIET,
        droppable_reserve=True,
    ) == (False, False)


def test_probe_path_droppable_reserve_streams(monkeypatch):
    # 14 GiB step + 3 GiB cache misses 16 GiB; dropping the cache keeps
    # no-remat instead of descending to block
    chosen, model, drop, cap = _probe_harness(
        monkeypatch,
        peaks={False: 14 * GIB, "block": 10 * GIB},
        budget=16 * GIB,
        reserve_bytes=3 * GIB,
        droppable_reserve=True,
    )
    assert chosen is False and model == ("m", False) and drop is True
    assert [m[1] for m in cap["models"]] == [False]


def test_recorded_remat_decision_roundtrip(tmp_path):
    """Resume must reuse BOTH halves of the decision: a rung chosen on the
    premise that batches stream from host would OOM if the resumed run
    re-pinned the dataset cache next to it."""
    import json

    from medvae_tpu.train.autoremat import recorded_remat_decision

    d = str(tmp_path)
    assert recorded_remat_decision(d) == (None, False)

    path = tmp_path / "trainer_state.json"
    path.write_text(
        json.dumps({"remat_rung": False, "device_cache_dropped": True})
    )
    assert recorded_remat_decision(d) == (False, True)

    path.write_text(json.dumps({"remat_rung": "block"}))
    assert recorded_remat_decision(d) == ("block", False)  # older runs

    path.write_text(
        json.dumps({"remat_rung": "bogus", "device_cache_dropped": True})
    )
    assert recorded_remat_decision(d) == (None, False)
