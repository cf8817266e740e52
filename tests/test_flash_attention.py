"""Flash-attention kernel tests (ops/flash_attention.py).

Interpreter-mode execution of the tiled online-softmax forward and the
FlashAttention-2 two-kernel backward, against the jnp einsum reference
(ops/attention.py:reference_attention). Shapes are chosen to force MULTIPLE
q/k blocks so the online-softmax rescale and the revisited accumulators are
actually exercised (a single-block run would pass trivially). Hardware
parity additionally validated on a real v5e — see ops/PERF_FLAGSHIP.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medvae_tpu.ops import attention as attn_mod
from medvae_tpu.ops import flash_attention as fa_mod


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu

    monkeypatch.setattr(fa_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(attn_mod, "_on_tpu", lambda: True)
    with pltpu.force_tpu_interpret_mode():
        yield


def _qkv(rs, b, n, c, dtype=jnp.float32):
    return tuple(
        jnp.asarray(rs.randn(b, n, c), dtype) for _ in range(3)
    )


def test_pick_block():
    assert fa_mod._pick_block(3136) == 448  # 7 blocks at the 56² level
    assert fa_mod._pick_block(784) == 112  # 7 blocks at the 28² level
    assert fa_mod._pick_block(96) == 96  # fits in one block
    assert fa_mod._pick_block(13) is None


def test_flash_forward_matches_reference_multiblock(monkeypatch):
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)  # n=96 → 3×3 blocks
    rs = np.random.RandomState(0)
    q, k, v = _qkv(rs, 2, 96, 128)
    out = fa_mod.flash_attention(q, k, v)
    ref = attn_mod.reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_flash_lse_is_correct(monkeypatch):
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)
    rs = np.random.RandomState(3)
    q, k, v = _qkv(rs, 1, 96, 128)
    _, lse = fa_mod._flash_fwd_kernel(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bic,bjc->bij", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(logits, axis=2)
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), np.asarray(ref_lse), atol=1e-5
    )
    # lane-replicated carrier: every lane holds the row value
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), np.asarray(lse[..., -1]), atol=0
    )


def test_flash_gradients_match_reference_multiblock(monkeypatch):
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)
    rs = np.random.RandomState(1)
    q, k, v = _qkv(rs, 2, 96, 128)

    def loss_p(q, k, v):
        return jnp.sum(jnp.tanh(fa_mod.flash_attention(q, k, v)))

    def loss_r(q, k, v):
        return jnp.sum(jnp.tanh(attn_mod.reference_attention(q, k, v)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_envelope_and_dispatch(monkeypatch):
    # c not lane-aligned → None
    bad_c = jnp.zeros((1, 96, 96))
    assert fa_mod.flash_attention_or_none(bad_c, bad_c, bad_c) is None
    # n with no ×16 divisor → None
    bad_n = jnp.zeros((1, 13, 128))
    assert fa_mod.flash_attention_or_none(bad_n, bad_n, bad_n) is None
    # fused_attention_or_none routes over-VMEM shapes to the flash path
    # (budget shrunk so an interpreter-sized shape triggers the route)
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)
    monkeypatch.setattr(fa_mod, "_MIN_BLOCK", 16)
    monkeypatch.setattr(attn_mod, "_VMEM_BUDGET", 1000)
    rs = np.random.RandomState(2)
    q, k, v = _qkv(rs, 1, 128, 128)
    out = attn_mod.fused_attention_or_none(q, k, v)
    assert out is not None
    ref = attn_mod.reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_bf16_inputs(monkeypatch):
    """bf16 operands, fp32 statistics — the production model's dtype mix."""
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)
    rs = np.random.RandomState(4)
    q, k, v = _qkv(rs, 1, 96, 128, jnp.bfloat16)
    out = fa_mod.flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    ref = attn_mod.reference_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_flash_vmem_guard_rejects_wide_channels():
    """ADVICE r4: wide-c shapes would blow the scoped VMEM at compile time;
    the envelope must return None (einsum fallback) instead. ShapeDtypeStructs
    suffice — the guard must trip before any kernel is built."""
    wide = jax.ShapeDtypeStruct((32, 4096, 2048), jnp.bfloat16)
    assert fa_mod.flash_attention_or_none(wide, wide, wide) is None
    # the production shape stays inside the envelope
    ok = jnp.zeros((1, 3136, 512), jnp.bfloat16)
    assert (
        fa_mod._flash_vmem_estimate(3136, 512, ok.dtype.itemsize)
        <= fa_mod._FLASH_VMEM_BUDGET
    )


def test_flash_direct_call_bad_n_raises_value_error():
    """ADVICE r4: direct callers bypassing the _or_none envelope must get a
    clear shape error, not an opaque TypeError from pallas_call setup."""
    bad = jnp.zeros((1, 13, 128), jnp.float32)
    with pytest.raises(ValueError, match="n=13"):
        fa_mod.flash_attention(bad, bad, bad)
    with pytest.raises(ValueError, match="n=13"):
        jax.grad(lambda q: jnp.sum(fa_mod.flash_attention(q, bad, bad)))(bad)


def test_flash_forward_only_skips_lse(monkeypatch):
    """ADVICE r4: the primal (no-grad) path runs the lse-free kernel and
    still matches the reference."""
    monkeypatch.setattr(fa_mod, "_MAX_BLOCK", 32)
    rs = np.random.RandomState(7)
    q, k, v = _qkv(rs, 2, 96, 128)
    out = fa_mod._flash_fwd_kernel(q, k, v, want_lse=False)
    assert not isinstance(out, tuple)
    ref = attn_mod.reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
