"""Device mesh and sharding helpers.

The reference framework has no multi-device story (Lightning `devices: 1`,
/root/reference/configs/config.yaml:21-23). Here the mesh is a first-class citizen:
every train step runs over a `jax.sharding.Mesh` — a 1-device mesh degenerates to
single-chip execution with zero overhead, and the same code scales over ICI.

Axes:
  * ``data``  — batch (data parallel). Gradient all-reduce rides ICI via psum.
  * ``model`` — reserved for tensor parallel sharding of wide conv channels.

By default all devices go to ``data`` (conv VAEs at MedMNIST sizes are far below
the HBM capacity of one chip, so DP is the right first-order parallelism).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Static description of the device mesh layout."""

    data: int = -1  # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh ({data} x {model}) does not tile {n_devices} devices"
            )
        return data, model


def create_mesh(
    spec: Optional[MeshSpec] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Create a 2-D (data, model) mesh over the given devices (default: all)."""
    devices = list(devices if devices is not None else jax.devices())
    spec = spec or MeshSpec()
    data, model = spec.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host pytree onto the mesh, batch axis sharded over ``data``."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. params) across the whole mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
