"""PRNG discipline.

The reference seeds torch/cudnn globally (src/utils/training_utils.py:147-154 in the
reference). JAX RNG is explicit and functional: one root key per run, split into
named streams; the train step folds the global step into its stream so every step
(and every data-parallel shard, via axis index folding) draws unique randomness
while staying bit-reproducible for a given seed.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> jax.Array:
    """Seed host-side RNGs (numpy/python, used by the data shuffler) and return
    the root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class RngStream:
    """A named, counted RNG stream: ``stream(step)`` is a unique key per step."""

    def __init__(self, root: jax.Array, name: str):
        self._key = jax.random.fold_in(root, _stable_hash(name))
        self.name = name

    def __call__(self, step: int | jax.Array) -> jax.Array:
        return jax.random.fold_in(self._key, step)

    def split(self, n: int):
        return jax.random.split(self._key, n)


def _stable_hash(s: str) -> int:
    h = 2166136261
    for ch in s.encode():
        h = (h ^ ch) * 16777619 & 0xFFFFFFFF
    return h
