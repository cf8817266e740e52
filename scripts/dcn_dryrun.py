#!/usr/bin/env python
"""Multi-host (DCN) dry run: 2 processes x 4 virtual CPU devices each.

Validates the cross-host data-parallel path end-to-end without TPU pods:
  * jax.distributed over two OS processes (the coordination-service setup a
    real multi-slice job uses),
  * a 3-D (dcn=2, data=4, model=1) mesh from core/mesh.py with one dcn row
    per process,
  * per-host batch feed (each process gathers only its addressable shard,
    `jax.make_array_from_process_local_data`) through DeviceFeeder,
  * the real jitted train step — XLA inserts the gradient all-reduce over
    both mesh axes (ICI within a slice, DCN across).

Run:  python scripts/dcn_dryrun.py            (parent; spawns 2 workers)
      python scripts/dcn_dryrun.py --worker N (internal)
Expect: both workers print `dcn dryrun ok loss=<same finite value>`.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = int(os.environ.get("DCN_DRYRUN_PORT", 29517))


def worker(process_id: int) -> int:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    # the ambient environment may pin a tunneled TPU backend via
    # sitecustomize; force the host platform through the config API
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{PORT}", num_processes=2, process_id=process_id
    )
    assert jax.process_count() == 2 and len(jax.devices()) == 8

    # Establish the cross-host Gloo context BEFORE any heavy compile, in two
    # stages. Gloo's KV rendezvous has a hard ~30 s deadline, and on a loaded
    # host the two processes can reach the first collective minutes apart
    # (cold vs warm persistent compile cache) — failing with "Gloo context
    # initialization failed: DEADLINE_EXCEEDED". Stage 1: a coordination-
    # service barrier with a generous timeout absorbs that skew at the Python
    # level. Stage 2: a trivial all-device sync then creates the Gloo context
    # with both processes aligned to within milliseconds; the context is
    # cached, so every later collective tolerates arbitrary skew.
    from jax._src import distributed
    from jax.experimental import multihost_utils

    distributed.global_state.client.wait_at_barrier(
        "dcn_dryrun_align", timeout_in_ms=540_000
    )
    multihost_utils.sync_global_devices("dcn_dryrun_warmup")

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate
    from medvae_tpu.data.medmnist import SplitArrays
    from medvae_tpu.data.pipeline import DeviceFeeder
    from medvae_tpu.models import ConditionalVAE
    from medvae_tpu.train.optim import build_optimizer
    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.step import build_train_step

    mesh = create_mesh(MeshSpec(data=4, model=1, dcn=2))
    assert mesh.axis_names == ("dcn", "data", "model"), mesh.axis_names

    model = ConditionalVAE(
        input_channels=3, latent_dim=4, hidden_channels=8, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(), dropout=0.0, resolution=16,
        condition_method="concat",
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12)))
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    state = replicate(mesh, create_train_state(variables["params"], tx))
    step = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=3,
        donate=False,
    )

    # synthetic arrays (identical on both hosts — the feeder slices per host)
    n, bs = 64, 16
    rs = np.random.RandomState(0)
    midx = (np.arange(n) % 5).astype(np.int32)
    arrays = SplitArrays(
        images=rs.randint(0, 255, (n, 16, 16, 3), np.uint8),
        labels=np.zeros((n,), np.int32),
        modality_idx=midx,
        channels=3,
    )
    feeder = DeviceFeeder(arrays, bs, mesh, shuffle=True, prefetch=1)

    # AOT-compile the step, then re-align at the coordination barrier before
    # the first execution: every compiled executable's FIRST collective
    # creates its own Gloo context, whose KV rendezvous has the same hard
    # ~30 s deadline as the warmup's — and compile-time skew (persistent-
    # cache hit on one worker, miss on the other) can exceed it. Aligning
    # AFTER compilation keeps both processes inside the deadline regardless
    # of cache state; later executions of the same executable reuse the
    # context (and the collectives themselves keep the workers in lockstep).
    import itertools

    step_rng = jax.random.PRNGKey(1)
    it = feeder.epoch(0)
    first_batch = next(it)
    compiled_step = step.lower(state, first_batch, step_rng).compile()
    distributed.global_state.client.wait_at_barrier(
        "dcn_dryrun_compiled", timeout_in_ms=540_000
    )

    losses = []
    for batch in itertools.chain([first_batch], it):
        # per-host shard sanity: image rows on this host = bs / 2
        state, m = compiled_step(state, batch, step_rng)
        losses.append(float(jax.device_get(m["train/loss"])))
    assert len(losses) == n // bs and all(np.isfinite(l) for l in losses)

    # Probe-batch sizing regression (ADVICE r4 / VERDICT r4 next #6): the
    # autoremat/autobatch probes must assemble GLOBAL batches from per-host
    # local rows — a global-sized host batch here would build a 2x-oversized
    # step and mis-size remat/batch decisions on multi-host runs.
    from medvae_tpu.train.autoremat import probe_batch

    class _DM:
        batch_size, size, max_channels = bs, 16, 3

    pb = probe_batch(_DM, mesh)
    assert pb["image_u8"].shape == (bs, 16, 16, 3), pb["image_u8"].shape
    pb2 = probe_batch(_DM, mesh, global_rows=2 * bs)
    assert pb2["image_u8"].shape[0] == 2 * bs, pb2["image_u8"].shape
    # the probe batch must be steppable (drives make_array_from_process_local
    # + the step at the probed size; reuse the aligned compiled executable —
    # pb's shapes match the training batches by construction)
    _, pm = compiled_step(state, pb, jax.random.PRNGKey(2))
    assert np.isfinite(float(jax.device_get(pm["train/loss"])))
    print(f"proc {process_id}: probe sizing ok rows={pb['image_u8'].shape[0]}",
          flush=True)

    print(
        f"proc {process_id}: dcn dryrun ok loss={losses[-1]:.6f} "
        f"steps={len(losses)}",
        flush=True,
    )
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", type=int, default=None)
    args = p.parse_args()
    if args.worker is not None:
        return worker(args.worker)

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for i in range(2)
    ]
    ok = True
    for i, proc in enumerate(procs):
        out, _ = proc.communicate(timeout=600)
        tail = [
            l for l in out.splitlines()
            if "dryrun" in l or "probe sizing" in l or "Error" in l
        ]
        print(f"[worker {i}] rc={proc.returncode} " + " | ".join(tail[-3:]))
        ok &= proc.returncode == 0 and any("dcn dryrun ok" in l for l in tail)
        ok &= any("probe sizing ok" in l for l in tail)
    print("DCN dryrun:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
