"""Fused GroupNorm + SiLU Pallas kernels (forward + custom-VJP backward).

GroupNorm's reduction spans all spatial positions and the channels of a group,
so unfused it costs multiple HBM passes per layer (stats pass, normalize pass,
activation pass) — measured at ~17% of the whole VAE train step on v5e. These
kernels keep a TILE of images resident in VMEM and do stats + normalize +
affine + swish in one pass; the backward recomputes the (cheap) statistics in
VMEM instead of storing them and fuses dx/dγ/dβ, with the per-tile dγ/dβ
partials accumulated across the sequential TPU grid.

Mosaic notes: group reductions go through channel→group membership matmuls
(sub-lane shape casts like (n, G, c/G) are unsupported), pinned to
Precision.HIGHEST (the TPU default truncates fp32 matmul operands to bf16,
which costs ~1e-2 absolute error in the stats).

Out-of-envelope shapes or non-TPU backends take the jnp path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_VMEM_BUDGET_BYTES = 8 * 1024 * 1024
_HIGH = jax.lax.Precision.HIGHEST


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _membership(c: int, num_groups: int) -> jax.Array:
    m = np.zeros((c, num_groups), np.float32)
    m[np.arange(c), np.arange(c) // (c // num_groups)] = 1.0
    return jnp.asarray(m)


def _pick_tile(b: int, n: int, c: int, tensors: int) -> int:
    """Largest divisor of b (≤64) whose fp32 working set fits the budget.

    `tensors` counts live fp32 (tile, n, c) intermediates; Mosaic additionally
    double-buffers the in/out blocks and materializes broadcast temporaries,
    so the estimate applies a 2× safety factor (empirically Mosaic's scoped
    allocation ran ~2.5× a naive 3-tensor count).
    """
    per_image = n * c * 4 * tensors * 2
    tile = 1
    for t in (64, 32, 16, 8, 4, 2, 1):
        if b % t == 0 and t * per_image <= _VMEM_BUDGET_BYTES:
            tile = t
            break
    return tile


def fused_group_norm_swish_or_none(
    x: jax.Array, scale: jax.Array, bias: jax.Array, *, num_groups: int, eps: float
) -> Optional[jax.Array]:
    """(b, h, w, c) → silu(group_norm(x)·scale+bias), or None if out of envelope."""
    # Opt-in only (MEDVAE_FUSED_GN=1). Measured on v5e for this model family,
    # XLA's own GN fusion WINS at every shape the VAEs produce: 43.3k img/s
    # (XLA) vs 16.5k (kernel everywhere) vs 28.2k (kernel at c≥128 only) on
    # the CVAE train bench — small channel counts underfill the 128-wide
    # lanes and the batch grid serializes. The validated kernel stays as
    # infrastructure for wide-channel models where the balance flips.
    import os

    if os.environ.get("MEDVAE_FUSED_GN") != "1":
        return None
    if not _on_tpu():
        return None
    b, h, w, c = x.shape
    if c % num_groups != 0:
        return None
    # backward holds ~10 (tile, n, c) fp32 tensors; require at least tile=1 fit
    if h * w * c * 4 * 10 * 2 > _VMEM_BUDGET_BYTES:
        return None
    return fused_group_norm_swish(x, scale, bias, num_groups, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_swish(x, scale, bias, num_groups: int, eps: float):
    return _fwd_kernel(x, scale, bias, num_groups, eps)


def _fwd(x, scale, bias, num_groups, eps):
    out = _fwd_kernel(x, scale, bias, num_groups, eps)
    return out, (x, scale, bias)


def _bwd(num_groups, eps, res, g):
    x, scale, bias = res
    dx, dscale, dbias = _bwd_kernel(x, scale, bias, g, num_groups, eps)
    return dx, dscale, dbias


fused_group_norm_swish.defvjp(_fwd, _bwd)


def _fwd_kernel(x, scale, bias, num_groups: int, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n = h * w
    cg = c // num_groups
    tile = _pick_tile(b, n, c, tensors=6)
    x3 = x.reshape(b, n, c)
    member = _membership(c, num_groups)

    def kernel(x_ref, s_ref, b_ref, m_ref, o_ref):
        xb = x_ref[...].astype(jnp.float32)  # (T, n, c)
        mem = m_ref[...]
        inv = 1.0 / (n * cg)
        ch_sum = jnp.sum(xb, axis=1)  # (T, c)
        ch_sq = jnp.sum(xb * xb, axis=1)
        g_mean = jnp.dot(ch_sum, mem, preferred_element_type=jnp.float32,
                         precision=_HIGH) * inv  # (T, G)
        g_sq = jnp.dot(ch_sq, mem, preferred_element_type=jnp.float32,
                       precision=_HIGH) * inv
        g_var = g_sq - g_mean * g_mean
        mean_c = jnp.dot(g_mean, mem.T, preferred_element_type=jnp.float32,
                         precision=_HIGH)  # (T, c)
        rstd_c = jnp.dot(jax.lax.rsqrt(g_var + eps), mem.T,
                         preferred_element_type=jnp.float32, precision=_HIGH)
        xhat = (xb - mean_c[:, None, :]) * rstd_c[:, None, :]
        z = xhat * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        o_ref[...] = (z * jax.nn.sigmoid(z)).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )(x3, scale[None, :], bias[None, :], member)
    return out.reshape(b, h, w, c)


def _bwd_kernel(x, scale, bias, g, num_groups: int, eps: float):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n = h * w
    cg = c // num_groups
    tile = _pick_tile(b, n, c, tensors=10)
    x3 = x.reshape(b, n, c)
    g3 = g.reshape(b, n, c)
    member = _membership(c, num_groups)

    def kernel(x_ref, s_ref, b_ref, m_ref, g_ref, dx_ref, ds_ref, db_ref):
        i = pl.program_id(0)
        xb = x_ref[...].astype(jnp.float32)  # (T, n, c)
        go = g_ref[...].astype(jnp.float32)
        mem = m_ref[...]
        gamma = s_ref[0].astype(jnp.float32)
        beta = b_ref[0].astype(jnp.float32)
        inv = 1.0 / (n * cg)

        # recompute stats
        ch_sum = jnp.sum(xb, axis=1)
        ch_sq = jnp.sum(xb * xb, axis=1)
        g_mean = jnp.dot(ch_sum, mem, preferred_element_type=jnp.float32,
                         precision=_HIGH) * inv
        g_sq = jnp.dot(ch_sq, mem, preferred_element_type=jnp.float32,
                       precision=_HIGH) * inv
        g_var = g_sq - g_mean * g_mean
        mean_c = jnp.dot(g_mean, mem.T, preferred_element_type=jnp.float32,
                         precision=_HIGH)
        rstd_c = jnp.dot(jax.lax.rsqrt(g_var + eps), mem.T,
                         preferred_element_type=jnp.float32, precision=_HIGH)
        xhat = (xb - mean_c[:, None, :]) * rstd_c[:, None, :]

        # silu backward: d silu(z)/dz = σ(z)·(1 + z·(1−σ(z)))
        z = xhat * gamma + beta
        sig = jax.nn.sigmoid(z)
        dz = go * sig * (1.0 + z * (1.0 - sig))

        # affine grads (partials for this tile); the (T, c) → (1, c) reduction
        # goes through a ones-matmul (a plain axis-0 sum trips a Mosaic
        # relayout on small sublane counts)
        t = xb.shape[0]
        ones_row = jnp.ones((1, t), jnp.float32)
        ds_part = jnp.dot(ones_row, jnp.sum(dz * xhat, axis=1),
                          preferred_element_type=jnp.float32,
                          precision=_HIGH)  # (1, c)
        db_part = jnp.dot(ones_row, jnp.sum(dz, axis=1),
                          preferred_element_type=jnp.float32, precision=_HIGH)

        # GN backward
        dxhat = dz * gamma
        ch_m1 = jnp.sum(dxhat, axis=1)  # (T, c)
        ch_m2 = jnp.sum(dxhat * xhat, axis=1)
        m1 = jnp.dot(jnp.dot(ch_m1, mem, preferred_element_type=jnp.float32,
                             precision=_HIGH) * inv, mem.T,
                     preferred_element_type=jnp.float32, precision=_HIGH)
        m2 = jnp.dot(jnp.dot(ch_m2, mem, preferred_element_type=jnp.float32,
                             precision=_HIGH) * inv, mem.T,
                     preferred_element_type=jnp.float32, precision=_HIGH)
        dx = rstd_c[:, None, :] * (
            dxhat - m1[:, None, :] - xhat * m2[:, None, :]
        )
        dx_ref[...] = dx.astype(dx_ref.dtype)

        @pl.when(i == 0)
        def _():
            ds_ref[...] = ds_part
            db_ref[...] = db_part

        @pl.when(i > 0)
        def _():
            ds_ref[...] += ds_part
            db_ref[...] += db_part

    dx, ds, db = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec((tile, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
    )(x3, scale[None, :], bias[None, :], member, g3)
    return dx.reshape(b, h, w, c), ds[0], db[0]
