"""Fused softmax-attention Pallas kernel for the VAE attention blocks.

The reference materializes a (hw)² attention matrix through two bmms and a
softmax (src/models/encoder_decoder.py:91-103). At the resolutions this model
family uses (≤256 tokens at attn res 16 on 224² inputs) the whole computation
for one batch element fits comfortably in VMEM, so the kernel fuses
q·kᵀ → scale → softmax → ·v into a single pass with no HBM round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_MAX_TOKENS = 1024
_MAX_CHANNELS = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def fused_attention_or_none(q: jax.Array, k: jax.Array, v: jax.Array):
    """(b, n, c) q/k/v → (b, n, c) attention output, or None if out of envelope."""
    b, n, c = q.shape
    if not _on_tpu():
        return None
    if n > _MAX_TOKENS or c > _MAX_CHANNELS:
        return None
    return _fused_attention(q, k, v)


@functools.partial(jax.jit, static_argnames=())
def _fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
        out = jnp.dot(p, vb, preferred_element_type=jnp.float32)
        o_ref[0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )(q, k, v)
