"""Mixed-precision policy.

The reference trains with Lightning AMP fp16 (/root/reference/configs/config.yaml:23).
On TPU the native fast dtype is bfloat16: the MXU consumes bf16 operands at full rate
and bf16 halves HBM traffic. Policy: params and optimizer state in float32, compute
(activations, conv/matmul operands) in bfloat16, reductions and the loss in float32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_to_output(self, tree):
        import jax

        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


def default_policy(mixed: bool = True) -> Policy:
    if mixed:
        return Policy()
    return Policy(compute_dtype=jnp.float32)
