"""Supervisor logic of scripts/train_resilient.py (fake runner, no JAX)."""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "scripts"))

from train_resilient import supervise  # noqa: E402


class FakeClock:
    """Monotonic clock advanced by the fake runner's declared uptimes."""

    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def make_runner(outcomes, clock, calls):
    """outcomes: list of (exit_code, uptime_s) consumed per attempt."""
    it = iter(outcomes)

    def runner(argv):
        calls.append(list(argv))
        code, uptime = next(it)
        clock.t += uptime
        return code

    return runner


def test_success_first_try_no_resume_appended():
    clock, calls = FakeClock(), []
    code = supervise(
        ["experiment=quick"],
        runner=make_runner([(0, 500)], clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert code == 0
    assert calls == [["experiment=quick"]]


def test_crash_then_resume_then_success():
    clock, calls = FakeClock(), []
    slept = []
    code = supervise(
        ["experiment=quick"],
        backoff_s=30,
        runner=make_runner([(1, 900), (1, 900), (0, 900)], clock, calls),
        sleeper=slept.append,
        clock=clock,
    )
    assert code == 0
    # +resume=true appended exactly once, kept for later relaunches
    assert calls[0] == ["experiment=quick"]
    assert calls[1] == ["experiment=quick", "+resume=true"]
    assert calls[2] == calls[1]
    # exponential backoff
    assert slept == [30, 60]


def test_fast_double_failure_is_deterministic_giveup():
    clock, calls = FakeClock(), []
    code = supervise(
        ["experiment=broken"],
        min_uptime_s=120,
        runner=make_runner([(2, 5), (2, 5), (0, 5)], clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert code == 2
    assert len(calls) == 2  # never reached the third (would-succeed) attempt


def test_fast_failure_budget_configurable_for_backend_outages():
    # a dead tunnel fails fast at device init; a raised budget rides it out
    clock, calls = FakeClock(), []
    outcomes = [(1, 5)] * 5 + [(0, 900)]
    code = supervise(
        ["e=x"],
        min_uptime_s=120,
        max_fast_failures=10,
        runner=make_runner(outcomes, clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert code == 0
    assert len(calls) == 6


def test_long_uptime_resets_fast_failure_counter():
    clock, calls = FakeClock(), []
    outcomes = [(1, 5), (1, 900), (1, 5), (1, 900), (0, 900)]
    code = supervise(
        ["e=x"],
        min_uptime_s=120,
        runner=make_runner(outcomes, clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert code == 0
    assert len(calls) == 5


def test_restart_budget_exhausted_returns_last_code():
    clock, calls = FakeClock(), []
    code = supervise(
        ["e=x"],
        max_restarts=3,
        runner=make_runner([(7, 900)] * 4, clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert code == 7
    assert len(calls) == 4


def test_existing_resume_flag_not_duplicated():
    clock, calls = FakeClock(), []
    supervise(
        ["e=x", "+resume=true"],
        runner=make_runner([(1, 900), (0, 900)], clock, calls),
        sleeper=lambda s: None,
        clock=clock,
    )
    assert calls[1] == ["e=x", "+resume=true"]


def test_backoff_capped():
    clock, calls = FakeClock(), []
    slept = []
    supervise(
        ["e=x"],
        backoff_s=100,
        max_backoff_s=150,
        runner=make_runner([(1, 900)] * 4 + [(0, 900)], clock, calls),
        sleeper=slept.append,
        clock=clock,
    )
    assert slept == [100, 150, 150, 150]
