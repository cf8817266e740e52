"""Train state pytree.

Replaces the Lightning module's implicit state (reference src/lightning_module.py)
with an explicit, checkpointable pytree: generator params + optimizer state,
optional discriminator params/batch-stats/optimizer state (dual-optimizer GAN,
reference :131-175), frozen perceptual-net params, and the global step.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    # frozen perceptual nets (LPIPS / CLIP); empty dict when unused
    frozen: Any = struct.field(default_factory=dict)
    # discriminator (GAN path only)
    disc_params: Optional[Any] = None
    disc_batch_stats: Optional[Any] = None
    disc_opt_state: Optional[Any] = None
    # host-driven LR multiplier (ReduceLROnPlateau support): scaling the final
    # Adam/AdamW update is exactly scaling the learning rate
    lr_scale: jax.Array = struct.field(
        default_factory=lambda: jnp.ones((), jnp.float32)
    )
    # optional EMA of params (reference exposes an unused EMA helper; here it
    # is a first-class opt-in via training.ema_decay)
    ema_params: Optional[Any] = None


def create_train_state(
    params: Any,
    tx: optax.GradientTransformation,
    frozen: Any = None,
    disc_variables: Optional[Any] = None,
    disc_tx: Optional[optax.GradientTransformation] = None,
    ema_decay: float = 0.0,
) -> TrainState:
    disc_params = disc_batch_stats = disc_opt_state = None
    if disc_variables is not None:
        disc_params = disc_variables["params"]
        disc_batch_stats = disc_variables.get("batch_stats", {})
        assert disc_tx is not None
        disc_opt_state = disc_tx.init(disc_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        frozen=frozen or {},
        disc_params=disc_params,
        disc_batch_stats=disc_batch_stats,
        disc_opt_state=disc_opt_state,
        lr_scale=jnp.ones((), jnp.float32),
        ema_params=jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None,
    )


def param_count(params: Any) -> int:
    """Total trainable parameter count (reference training_utils.py:127-144)."""
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
