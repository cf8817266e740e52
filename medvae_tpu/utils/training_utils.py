"""Training utilities.

Parity targets (reference src/utils/training_utils.py):
  * EarlyStopping (:60-124) — host-side counter on a monitored metric
  * count_parameters (:127-144)
  * WGAN-GP gradient penalty (:157-201) — jnp version (unused by the default
    trainer, as in the reference, but part of the public surface)
  * exponential_moving_average (:221-227) — functional pytree EMA
  * compute_gradient_norm (:204-218) — optax.global_norm is used inline in the
    train step; re-exported here for API parity

(Schedulers live in train/optim.py; seeding in core/rng.py.)
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

compute_gradient_norm = optax.global_norm


class EarlyStopping:
    """Stop when the monitored metric hasn't improved for `patience` checks."""

    def __init__(
        self,
        patience: int = 20,
        min_delta: float = 0.0,
        mode: str = "min",
        monitor: str = "val/loss",
    ):
        self.patience = patience
        self.min_delta = min_delta
        self.mode = mode
        self.monitor = monitor
        self.best: float | None = None
        self.counter = 0
        self.should_stop = False

    def update(self, metrics: Dict[str, float]) -> bool:
        value = metrics.get(self.monitor)
        if value is None:
            return False
        value = float(value)
        improved = (
            self.best is None
            or (self.mode == "min" and value < self.best - self.min_delta)
            or (self.mode == "max" and value > self.best + self.min_delta)
        )
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop


def count_parameters(params: Any, verbose: bool = False) -> int:
    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    if verbose:
        print(f"Total trainable parameters: {total:,}")
    return total


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """p_ema ← decay·p_ema + (1−decay)·p (functional, jit-able)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_params, params
    )


def gradient_penalty(
    disc_apply: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    rng: jax.Array,
) -> jax.Array:
    """WGAN-GP: E[(‖∇_x̂ D(x̂)‖₂ − 1)²] on interpolates x̂ = α·x + (1−α)·x̃."""
    b = real.shape[0]
    alpha = jax.random.uniform(rng, (b, 1, 1, 1), real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    def d_sum(x):
        return jnp.sum(disc_apply(x))

    grads = jax.grad(d_sum)(interp)
    norms = jnp.sqrt(
        jnp.sum(jnp.square(grads.reshape(b, -1)).astype(jnp.float32), axis=1) + 1e-12
    )
    return jnp.mean(jnp.square(norms - 1.0))
