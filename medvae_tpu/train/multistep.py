"""Fused multi-step training: K optimizer steps per device dispatch.

The per-step dispatch loop (host: next batch -> step call -> repeat) pays one
host->device round trip per optimizer step. On a host-attached TPU that is
~100 us and irrelevant; through a high-latency link (this environment's
tunneled PJRT: ~150 ms/step) it dominates small-batch configs outright —
measured 95 s/epoch for the multi-modal quick config (bs 16, 640 steps) whose
actual compute is ~2 s.

The TPU-idiomatic fix is the standard multi-step pattern: run K steps inside
ONE jitted `lax.scan`, assembling each step's batch in-graph from the
DeviceCachedFeeder's pinned arrays (data/pipeline.py). The host dispatches
once per chunk; data, shuffle permutation, and optimizer state never leave
the device. Semantics are identical to the per-step loop: the raw step
function (train/step.py, `raw=True`) folds the rng by `state.step` exactly as
the dispatched step does, consumes the same batches in the same order, and
applies the same updates — equal up to XLA reassociation (compiling the same
math inside a scan fuses reductions differently; measured ~1e-6 relative on
gradients). tests/test_multistep.py pins this with an SGD run where any
formulation error would surface three orders of magnitude above that noise.

The reference has no analogue (Lightning dispatches per batch by design);
this is a new capability of the TPU-native runtime.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def build_chunk_runner(
    raw_step: Callable,
    feeder,
    *,
    donate: bool = True,
) -> Callable:
    """Couple a raw (un-jitted) train step with a DeviceCachedFeeder.

    Returns run(state, epoch, step0, n_steps, rng) -> (state, metrics) where
    `metrics` holds the LAST step's values (what the per-step loop would have
    in hand after the chunk). One executable is compiled per distinct
    `n_steps` (chunk boundaries produce only a few distinct sizes).
    """
    assemble = feeder.assemble_traced

    def chunk(state, images, labels, midx, perm, step0, rng, n_steps: int):
        def body(st, i):
            batch = assemble(images, labels, midx, perm, step0 + i)
            st, metrics = raw_step(st, batch, rng)
            return st, metrics

        state, stacked = jax.lax.scan(
            body, state, jnp.arange(n_steps, dtype=jnp.int32)
        )
        last = jax.tree_util.tree_map(lambda t: t[-1], stacked)
        return state, last

    jitted = jax.jit(
        chunk,
        static_argnums=(7,),
        donate_argnums=(0,) if donate else (),
    )

    def run(state, epoch: int, step0: int, n_steps: int, rng):
        images, labels, midx = feeder.device_arrays
        perm = feeder.epoch_perm(epoch)
        return jitted(
            state, images, labels, midx, perm,
            jnp.asarray(step0, jnp.int32), rng, int(n_steps),
        )

    return run


def build_eval_chunk_runner(raw_eval: Callable, feeder) -> Callable:
    """Whole-split evaluation in ONE dispatch: scan the eval step over every
    batch (assembled in-graph from the cached split) and return the stacked
    per-batch metrics in a single device_get. Replaces steps_per_epoch
    dispatch+fetch round trips — validation was most of a small-config
    epoch's wall time through a high-latency link.
    """
    assemble = feeder.assemble_traced

    def chunk(state, images, labels, midx, perm, rng, start, n_steps: int):
        def body(carry, i):
            batch = assemble(images, labels, midx, perm, i)
            return carry, raw_eval(state, batch, rng)

        _, stacked = jax.lax.scan(
            body, None, start + jnp.arange(n_steps, dtype=jnp.int32)
        )
        return stacked

    jitted = jax.jit(chunk, static_argnums=(7,))

    def run(state, epoch: int, n_steps: int, rng, start: int = 0) -> Dict[str, Any]:
        """Evaluate split batches [start, start+n_steps). `start` is traced
        (a capped whole-split eval reuses one executable per chunk size)."""
        images, labels, midx = feeder.device_arrays
        perm = feeder.epoch_perm(epoch)
        return jax.device_get(
            jitted(
                state, images, labels, midx, perm, rng,
                jnp.asarray(start, jnp.int32), int(n_steps),
            )
        )

    return run


def chunk_plan(
    total_steps: int, start: int, *boundaries_every: int,
    extra: Tuple[int, ...] = (),
) -> Tuple[Tuple[int, int], ...]:
    """((step0, n_steps), ...) covering [start, total_steps), cut at every
    multiple of each cadence in `boundaries_every` (log_every,
    checkpoint-every, ...; 0/negative cadences ignored) and at each absolute
    step in `extra` (e.g. a mid-epoch validation point) so the host regains
    control exactly where the per-step loop would have acted."""
    cuts = {total_steps}
    cuts.update(extra)
    for every in boundaries_every:
        if every and every > 0:
            cuts.update(range(0, total_steps + 1, every))
    points = sorted(c for c in cuts if start < c <= total_steps)
    plan = []
    lo = start
    for hi in points:
        plan.append((lo, hi - lo))
        lo = hi
    return tuple(plan)
