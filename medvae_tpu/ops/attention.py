"""Fused softmax-attention Pallas kernel for the VAE attention blocks.

The reference materializes a (hw)² attention matrix through two bmms and a
softmax (src/models/encoder_decoder.py:91-103). At the resolutions this model
family uses (≤256 tokens at attn res 16 on 224² inputs; 49 tokens at the 28²
mid-block) the whole computation for one batch element fits in VMEM, so the
forward kernel fuses q·kᵀ → scale → softmax → ·v in a single pass with no HBM
round-trips, and the backward kernel fuses the full dq/dk/dv computation
(recomputing the softmax in VMEM instead of storing the (hw)² matrix — the
flash-attention trade: FLOPs for HBM bandwidth).

Out-of-envelope shapes or non-TPU backends return None and the caller uses the
jnp einsum path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom under the ~16MB scoped limit


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _vmem_estimate(n: int, c: int) -> int:
    """Backward-pass working set (the larger of fwd/bwd): seven (n, c) fp32
    tensors (q/k/v/g/dq/dk/dv) + three (n, n) fp32 (logits, p, dp)."""
    return (7 * n * c + 3 * n * n) * 4


# Below this per-element workload XLA's batched einsum wins: a (b,) grid of
# tiny blocks serializes on grid overhead while XLA tiles the whole batch onto
# the MXU in one batched matmul (measured: 49-token/16-ch attention is ~7%
# FASTER via XLA). The kernel's value is avoiding the (n,n) HBM round-trip,
# which only matters once n is large.
_MIN_TOKENS = 128
_MIN_CHANNELS = 64


def fused_attention_or_none(q: jax.Array, k: jax.Array, v: jax.Array):
    """(b, n, c) q/k/v → (b, n, c) attention output, or None if out of envelope.

    Dispatch: the whole-sequence kernel below when (n, n) fits VMEM; the
    tiled flash kernels (ops/flash_attention.py) for the larger levels the
    flagship 224² model produces (3136×512, 784×1024), where the einsum
    fallback's (b, n, n) HBM softmax is the measured bottleneck
    (ops/PERF_FLAGSHIP.md)."""
    _, n, c = q.shape
    if not _on_tpu():
        return None
    if n < _MIN_TOKENS or c < _MIN_CHANNELS:
        return None
    if _vmem_estimate(n, c) > _VMEM_BUDGET:
        from medvae_tpu.ops.flash_attention import flash_attention_or_none

        return flash_attention_or_none(q, k, v)
    return fused_attention(q, k, v)


@jax.custom_vjp
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return _attention_fwd_kernel(q, k, v)


def _attention_fwd(q, k, v):
    out = _attention_fwd_kernel(q, k, v)
    return out, (q, k, v)


def _attention_bwd(res, g):
    q, k, v = res
    return _attention_bwd_kernel(q, k, v, g)


fused_attention.defvjp(_attention_fwd, _attention_bwd)


def _specs(n: int, c: int, count: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return [
        pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _attention_fwd_kernel(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl

    b, n, c = q.shape
    scale = float(c) ** -0.5

    def kernel(q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0].astype(jnp.float32)
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        logits = (
            jax.lax.dot_general(
                qb,
                kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        logits -= jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits)
        p /= jnp.sum(p, axis=1, keepdims=True)
        o_ref[0] = jnp.dot(p, vb, preferred_element_type=jnp.float32).astype(
            o_ref.dtype
        )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid=(b,),
        in_specs=_specs(n, c, 3),
        out_specs=_specs(n, c, 1)[0],
    )(q, k, v)


def _attention_bwd_kernel(q, k, v, g):
    """Fused backward: recompute softmax in VMEM, emit (dq, dk, dv)."""
    from jax.experimental import pallas as pl

    b, n, c = q.shape
    scale = float(c) ** -0.5

    def kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
        qb = q_ref[0].astype(jnp.float32)
        kb = k_ref[0].astype(jnp.float32)
        vb = v_ref[0].astype(jnp.float32)
        gb = g_ref[0].astype(jnp.float32)

        logits = (
            jax.lax.dot_general(
                qb, kb,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        logits -= jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits)
        p /= jnp.sum(p, axis=1, keepdims=True)  # (n, n)

        # dv[j, c] = Σ_i p[i, j] g[i, c]
        dv = jax.lax.dot_general(
            p, gb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dp[i, j] = Σ_c g[i, c] v[j, c]
        dp = jax.lax.dot_general(
            gb, vb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # softmax backward: dlogits = p ⊙ (dp − Σ_j dp·p)
        dlogits = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        dq = jnp.dot(dlogits, kb, preferred_element_type=jnp.float32) * scale
        # dk[j, c] = Σ_i dlogits[i, j] q[i, c] · scale
        dk = (
            jax.lax.dot_general(
                dlogits, qb,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )
        dq_ref[0] = dq.astype(dq_ref.dtype)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv.astype(dv_ref.dtype)

    dq, dk, dv = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, n, c), k.dtype),
            jax.ShapeDtypeStruct((b, n, c), v.dtype),
        ),
        grid=(b,),
        in_specs=_specs(n, c, 4),
        out_specs=tuple(_specs(n, c, 3)),
    )(q, k, v, g)
    return dq, dk, dv


def reference_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """jnp reference implementation (used by the fallback path and in tests)."""
    c = q.shape[-1]
    scale = jnp.asarray(c, jnp.float32) ** -0.5
    w = jnp.einsum("bic,bjc->bij", q, k, preferred_element_type=jnp.float32) * scale
    w = jax.nn.softmax(w, axis=2)
    return jnp.einsum(
        "bij,bjc->bic", w.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)
