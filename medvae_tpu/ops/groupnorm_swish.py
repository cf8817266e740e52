"""Fused GroupNorm + SiLU Pallas kernel.

GroupNorm's reduction spans all spatial positions and the channels of a group,
so XLA typically emits normalize → scale/shift → silu as separate HBM passes.
This kernel keeps one image's activation block resident in VMEM and does
stats + normalize + affine + swish in a single pass. Out-of-envelope shapes
(activation block too large for VMEM) return None and the caller falls back to
the jnp path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fused_group_norm_swish_or_none(
    x: jax.Array, scale: jax.Array, bias: jax.Array, *, num_groups: int, eps: float
):
    """(b, h, w, c) → silu(group_norm(x)·scale+bias), or None if out of envelope."""
    if not _on_tpu():
        return None
    b, h, w, c = x.shape
    if c % num_groups != 0:
        return None
    # fp32 working copy per image must fit the VMEM budget
    if h * w * c * 4 * 2 > _VMEM_BUDGET_BYTES:
        return None
    return _fused_gn_swish(x, scale, bias, num_groups, eps)


def _fused_gn_swish(x, scale, bias, num_groups: int, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n = h * w
    cg = c // num_groups
    x2 = x.reshape(b, n, c)

    def kernel(x_ref, s_ref, b_ref, o_ref):
        xb = x_ref[0].astype(jnp.float32)  # (n, c)
        xg = xb.reshape(n, num_groups, cg)
        mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
        var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
        xn = (xg - mean) * jax.lax.rsqrt(var + eps)
        xn = xn.reshape(n, c)
        y = xn * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(x2, scale[None, :], bias[None, :])
    return out.reshape(b, h, w, c)
