"""Tensor parallelism over the `model` mesh axis.

The scaling-book recipe, not hand-written collectives: conv/dense kernels get
their output-feature dimension sharded over `model` via NamedShardings, the
train step is jitted over the 2-D (data, model) mesh, and XLA's SPMD
partitioner propagates the shardings through the graph — inserting the
all-gathers where a channel-sharded activation feeds a spatially-mixing conv
and the psums for GroupNorm's cross-channel statistics.

At MedMNIST scales one chip holds the whole model with room to spare, so DP is
the production configuration; this exists so the same codebase scales when the
conv trunk grows (mesh.model > 1 in the config is all it takes), and is tested
on the virtual CPU mesh (tests/test_tensor_parallel.py).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from medvae_tpu.core.mesh import MODEL_AXIS


def param_sharding_rule(path: tuple, leaf, mesh: Mesh) -> NamedSharding:
    """Shard conv/dense kernels on their output-feature axis over `model`
    when it divides evenly; everything else replicates.

    Conv kernels are (kh, kw, Cin, Cout); Dense kernels (In, Out); biases and
    norm affines (C,) stay replicated (they're tiny and feed into reductions).
    """
    model_size = mesh.shape[MODEL_AXIS]
    name = path[-1] if path else ""
    if (
        model_size > 1
        and name == "kernel"
        and hasattr(leaf, "ndim")
        and leaf.ndim >= 2
        and leaf.shape[-1] % model_size == 0
        and leaf.shape[-1] >= 2 * model_size
    ):
        spec = [None] * leaf.ndim
        spec[-1] = MODEL_AXIS
        return NamedSharding(mesh, P(*spec))
    return NamedSharding(mesh, P())


def _key_name(k) -> str:
    for attr in ("key", "name", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a param pytree on the mesh with TP kernel sharding."""

    def place(path, leaf):
        keys = tuple(_key_name(k) for k in path)
        return jax.device_put(leaf, param_sharding_rule(keys, leaf, mesh))

    return jax.tree_util.tree_map_with_path(place, params)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """Sharding pytree for a whole TrainState: params (and optimizer moments,
    which mirror the param tree) follow the TP rule; scalars replicate."""

    def rule(path, leaf):
        keys = tuple(_key_name(k) for k in path)
        return param_sharding_rule(keys, leaf, mesh)

    return jax.tree_util.tree_map_with_path(rule, state)


def shard_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, state_shardings(state, mesh))
