#!/usr/bin/env python
"""Supervise a training run: relaunch on crash, resuming from `last`.

Long runs on tunneled/preemptible TPU backends die for reasons that have
nothing to do with the training math (worker restarts, transport resets).
The trainer already gives bitwise-exact resume from the `last` checkpoint
(train/trainer.py, tests/test_trainer_integration.py::test_resume_*); this
script closes the loop: run the train CLI, and if it exits nonzero, wait,
append `+resume=true`, and relaunch — so a 100-epoch run survives backend
blips with zero lost steps (set `checkpointing.every_n_steps` for
within-epoch `last` refreshes).

Usage:
    python scripts/train_resilient.py [supervisor flags] -- <train CLI args>

    python scripts/train_resilient.py --max-restarts 50 -- \
        experiment=disentangled_multi_modal_cvae_full \
        checkpointing.every_n_steps=50 training.max_epochs=100

Crash-loop guard: if a relaunch dies faster than --min-uptime
--max-fast-failures times in a row, the failure is treated as deterministic
(bad config, OOM every step) and the supervisor gives up instead of
spinning. Raise --max-fast-failures when the backend itself may be down
for a while (a dead tunnel also fails fast, at device init) — exponential
backoff makes a large budget cheap.

The reference has no equivalent (Lightning runs die with the process);
this is the failure-detection/auto-restart half of SURVEY.md §5 applied
to the single-process TPU case.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time


def supervise(
    train_args: list[str],
    *,
    max_restarts: int = 20,
    backoff_s: float = 30.0,
    max_backoff_s: float = 600.0,
    min_uptime_s: float = 120.0,
    max_fast_failures: int = 2,
    runner=None,
    sleeper=time.sleep,
    clock=time.monotonic,
) -> int:
    """Run the train CLI under supervision; return its final exit code.

    `runner(argv) -> int` defaults to a subprocess launch of
    `python -m medvae_tpu.cli.train`; injectable for tests.
    """
    if runner is None:
        def runner(argv: list[str]) -> int:
            return subprocess.call([sys.executable, "-m", "medvae_tpu.cli.train", *argv])

    argv = list(train_args)
    resumed = any(a.split("=", 1)[0].lstrip("+") == "resume" for a in argv)
    fast_failures = 0
    delay = backoff_s
    for attempt in range(max_restarts + 1):
        t0 = clock()
        code = runner(argv)
        uptime = clock() - t0
        if code == 0:
            if attempt:
                print(f"[resilient] completed after {attempt} restart(s)")
            return 0
        fast_failures = fast_failures + 1 if uptime < min_uptime_s else 0
        if fast_failures >= max_fast_failures:
            print(
                f"[resilient] {fast_failures} consecutive failures in "
                f"<{min_uptime_s:.0f}s (exit {code}) — deterministic failure, "
                "giving up",
                file=sys.stderr,
            )
            return code
        if attempt == max_restarts:
            print(
                f"[resilient] exit {code}; restart budget ({max_restarts}) spent",
                file=sys.stderr,
            )
            return code
        if not resumed:
            argv = [*argv, "+resume=true"]
            resumed = True
        print(
            f"[resilient] exit {code} after {uptime:.0f}s; "
            f"restart {attempt + 1}/{max_restarts} in {delay:.0f}s (+resume=true)",
            file=sys.stderr,
        )
        sleeper(delay)
        delay = min(delay * 2, max_backoff_s)
    return code  # unreachable


def main() -> int:
    p = argparse.ArgumentParser(
        description=__doc__.split("\n")[0],
        usage="%(prog)s [flags] -- <train CLI args>",
    )
    p.add_argument("--max-restarts", type=int, default=20)
    p.add_argument("--backoff", type=float, default=30.0, metavar="SECONDS")
    p.add_argument("--max-backoff", type=float, default=600.0, metavar="SECONDS")
    p.add_argument(
        "--min-uptime", type=float, default=120.0, metavar="SECONDS",
        help="exits faster than this count as fast failures",
    )
    p.add_argument(
        "--max-fast-failures", type=int, default=2,
        help="consecutive fast failures that abort the loop "
        "(raise for backend outages: a dead tunnel also fails fast)",
    )
    if "--" not in sys.argv:
        p.error("separate train CLI args with `--`")
    split = sys.argv.index("--")
    ns = p.parse_args(sys.argv[1:split])
    return supervise(
        sys.argv[split + 1:],
        max_restarts=ns.max_restarts,
        backoff_s=ns.backoff,
        max_backoff_s=ns.max_backoff,
        min_uptime_s=ns.min_uptime,
        max_fast_failures=ns.max_fast_failures,
    )


if __name__ == "__main__":
    raise SystemExit(main())
