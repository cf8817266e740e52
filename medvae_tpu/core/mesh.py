"""Device mesh and sharding helpers.

The reference framework has no multi-device story (Lightning `devices: 1`,
/root/reference/configs/config.yaml:21-23). Here the mesh is a first-class citizen:
every train step runs over a `jax.sharding.Mesh` — a 1-device mesh degenerates to
single-chip execution with zero overhead, and the same code scales over ICI and,
across hosts/slices, over DCN.

Axes:
  * ``dcn``   — across processes (multi-host / multi-slice). Present only when
    the job runs >1 process (or a spec forces it); gradient all-reduce over
    this axis rides DCN, so batch is sharded over ``(dcn, data)`` jointly and
    params stay replicated — pure data parallelism across slices, the standard
    DCN-friendly layout (model/tensor sharding stays inside the ICI domain).
  * ``data``  — batch (data parallel) within a slice. All-reduce rides ICI.
  * ``model`` — tensor-parallel sharding of wide conv channels (ICI).

By default all local devices go to ``data`` (conv VAEs at MedMNIST sizes are far
below the HBM capacity of one chip, so DP is the right first-order parallelism).

Multi-process placement: hosts feed only their addressable shard
(`jax.make_array_from_process_local_data`); see scripts/dcn_dryrun.py for the
2-process × 4-device CPU validation of this path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"
DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Static description of the device mesh layout.

    ``dcn``: 0 = auto (jax.process_count()); 1 = no cross-host axis (mesh is
    2-D, backward compatible); >1 = explicit process-count axis.
    """

    data: int = -1  # -1: all remaining devices
    model: int = 1
    dcn: int = 0

    def resolve(self, n_devices: int, n_processes: int = 1) -> tuple[int, int, int]:
        dcn = self.dcn if self.dcn > 0 else max(1, n_processes)
        model = max(1, self.model)
        per_slice = n_devices // dcn
        data = self.data if self.data > 0 else per_slice // model
        if dcn * data * model != n_devices:
            raise ValueError(
                f"mesh ({dcn} x {data} x {model}) does not tile {n_devices} devices"
            )
        return dcn, data, model


def create_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Create the device mesh: 2-D (data, model) for single-process jobs,
    3-D (dcn, data, model) when >1 process (or the spec forces dcn>1), with
    each dcn row holding exactly one process's devices so the batch's dcn
    shard is host-addressable."""
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    dcn, data, model = spec.resolve(len(devices), jax.process_count())
    if dcn <= 1:
        dev_array = np.asarray(devices).reshape(data, model)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    # group devices by owning process: one dcn row per process
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    dev_array = np.asarray(devices).reshape(dcn, data, model)
    return Mesh(dev_array, (DCN_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh):
    """Mesh axes the batch dimension shards over: (dcn, data) on a 3-D mesh."""
    if DCN_AXIS in mesh.axis_names:
        return (DCN_AXIS, DATA_AXIS)
    return DATA_AXIS


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data`` (and ``dcn`` when the mesh
    has a cross-host axis); replicate the rest."""
    return NamedSharding(mesh, P(batch_axes(mesh), *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, batch axis sharded over ``data``
    (and ``dcn``).

    Single-process: `batch` holds the GLOBAL batch. Multi-process: each host
    passes only its LOCAL rows (global_batch / process_count), assembled into
    the global array without cross-host transfer."""
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                data_sharding(mesh, np.ndim(x)), np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the whole mesh. Multi-process:
    every host must hold the same values (same-seed init / restored ckpt)."""
    sh = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            tree,
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
