"""Pallas kernel tests.

On CPU the production `*_or_none` wrappers return None (the envelope check),
so these tests exercise the kernels in Pallas **interpreter mode** — same
kernel code, software-executed — against the jnp reference math. Hardware
parity was additionally validated on a real v5e (attention fwd exact,
bwd ≤ 5e-3; GN+SiLU ≤ 2e-6); see the docstrings in medvae_tpu/ops/.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medvae_tpu.nn.blocks import _group_norm_ref, swish
from medvae_tpu.ops import attention as attn_mod
from medvae_tpu.ops import groupnorm_swish as gn_mod


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run pallas kernels in interpreter mode and open the backend gates."""
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(gn_mod, "_on_tpu", lambda: True)
    monkeypatch.setenv("MEDVAE_FUSED_GN", "1")
    with pltpu.force_tpu_interpret_mode():
        yield


def test_fused_attention_forward_matches_reference():
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(2, 16, 32), jnp.float32)
    k = jnp.asarray(rs.randn(2, 16, 32), jnp.float32)
    v = jnp.asarray(rs.randn(2, 16, 32), jnp.float32)
    out_p = attn_mod.fused_attention(q, k, v)
    out_r = attn_mod.reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_r), atol=1e-5
    )


def test_fused_attention_gradients_match_reference():
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 8, 16), jnp.float32)
    k = jnp.asarray(rs.randn(1, 8, 16), jnp.float32)
    v = jnp.asarray(rs.randn(1, 8, 16), jnp.float32)

    def loss_p(q, k, v):
        return jnp.sum(jnp.tanh(attn_mod.fused_attention(q, k, v)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.tanh(attn_mod.reference_attention(q, k, v)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_gn_swish_matches_reference():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 6, 6, 32) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rs.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(32) * 0.1, jnp.float32)
    out_k = gn_mod.fused_group_norm_swish_or_none(
        x, scale, bias, num_groups=16, eps=1e-6
    )
    assert out_k is not None
    out_j = swish(_group_norm_ref(x, scale, bias, 16))
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_j), atol=1e-5
    )


def test_envelope_gates():
    """Out-of-envelope shapes must return None (fallback path)."""
    big = jnp.zeros((1, 2048, 64))
    assert attn_mod.fused_attention_or_none(big, big, big) is None
    huge = jnp.zeros((1, 512, 512, 128))
    assert (
        gn_mod.fused_group_norm_swish_or_none(
            huge, jnp.ones(128), jnp.zeros(128), num_groups=32, eps=1e-6
        )
        is None
    )


def test_fused_gn_swish_gradients_match_reference():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 4, 4, 32), jnp.float32)
    scale = jnp.asarray(rs.rand(32) + 0.5, jnp.float32)
    bias = jnp.asarray(rs.randn(32) * 0.1, jnp.float32)

    def loss_k(x, s, b):
        return jnp.sum(
            jnp.tanh(gn_mod.fused_group_norm_swish(x, s, b, 16, 1e-6))
        )

    def loss_r(x, s, b):
        return jnp.sum(jnp.tanh(swish(_group_norm_ref(x, s, b, 16))))

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)
