"""Multi-host (DCN) scaffolding tests.

The heavy path — 2 real OS processes x 4 virtual CPU devices, jax.distributed,
3-D (dcn, data, model) mesh, per-host feed, jitted train step with cross-host
all-reduce — runs in subprocesses via scripts/dcn_dryrun.py (VERDICT r1
item 8). In-process tests cover the mesh/spec logic."""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

from medvae_tpu.core.mesh import DCN_AXIS, MeshSpec, batch_axes, create_mesh

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_meshspec_resolves_dcn():
    assert MeshSpec().resolve(8, 1) == (1, 8, 1)
    assert MeshSpec().resolve(8, 2) == (2, 4, 1)  # auto dcn = process_count
    assert MeshSpec(model=2).resolve(8, 2) == (2, 2, 2)
    assert MeshSpec(dcn=2, data=2, model=2).resolve(8) == (2, 2, 2)
    with pytest.raises(ValueError):
        MeshSpec(dcn=3).resolve(8)


def test_single_process_mesh_stays_2d():
    mesh = create_mesh(MeshSpec(data=4, model=2), jax.devices()[:8])
    assert mesh.axis_names == ("data", "model")
    assert batch_axes(mesh) == "data"


def test_forced_dcn_mesh_is_3d():
    mesh = create_mesh(MeshSpec(dcn=2, data=2, model=2), jax.devices()[:8])
    assert mesh.axis_names == (DCN_AXIS, "data", "model")
    assert batch_axes(mesh) == (DCN_AXIS, "data")


def test_shard_map_steps_reject_dcn_mesh():
    from medvae_tpu.parallel import build_shard_map_train_step

    mesh = create_mesh(MeshSpec(dcn=2, data=4, model=1), jax.devices()[:8])
    with pytest.raises(NotImplementedError, match="dcn"):
        build_shard_map_train_step(None, {"type": "vae"}, None, mesh)


@pytest.mark.slow
def test_dcn_dryrun_two_processes():
    """2 jax.distributed processes, per-host feed, identical final loss."""
    out = subprocess.run(
        [sys.executable, os.path.join(_ROOT, "scripts", "dcn_dryrun.py")],
        capture_output=True, text=True, timeout=540,
        env={**os.environ, "DCN_DRYRUN_PORT": "29533"},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "DCN dryrun: OK" in out.stdout
    # autoremat/autobatch probe sizing stays per-host (train/autoremat.py:
    # probe_batch) — both workers must have asserted and reported it
    assert out.stdout.count("probe sizing ok") == 2, out.stdout
    # both workers report the same loss (replicated state stayed in sync)
    losses = {
        line.split("loss=")[1].split()[0]
        for line in out.stdout.splitlines()
        if "dcn dryrun ok" in line
    }
    assert len(losses) == 1, out.stdout
