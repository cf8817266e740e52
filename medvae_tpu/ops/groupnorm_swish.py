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
    # Group statistics via matmuls with a channel→group membership matrix:
    # Mosaic can't shape-cast (n, c) → (n, G, c/G) when c/G is sub-lane-sized,
    # but (1,c)·(c,G) and (1,G)·(G,c) dots map cleanly onto the MXU.
    import numpy as np

    member = np.zeros((c, num_groups), np.float32)
    member[np.arange(c), np.arange(c) // cg] = 1.0
    member = jnp.asarray(member)

    def kernel(x_ref, s_ref, b_ref, m_ref, o_ref):
        xb = x_ref[0].astype(jnp.float32)  # (n, c)
        mem = m_ref[:]  # (c, G)
        inv_count = 1.0 / (n * cg)
        ch_sum = jnp.sum(xb, axis=0, keepdims=True)  # (1, c)
        ch_sq = jnp.sum(xb * xb, axis=0, keepdims=True)
        g_mean = (
            jnp.dot(ch_sum, mem, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) * inv_count
        )  # (1, G)
        g_sq = jnp.dot(ch_sq, mem, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST) * inv_count
        g_var = g_sq - g_mean * g_mean
        # broadcast group stats back to channels: (1, G) · (G, c)
        mean_c = jnp.dot(g_mean, mem.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
        rstd_c = jnp.dot(
            jax.lax.rsqrt(g_var + eps), mem.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y = (xb - mean_c) * rstd_c
        y = y * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, num_groups), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(x2, scale[None, :], bias[None, :], member)
    return out.reshape(b, h, w, c)
