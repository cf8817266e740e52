"""Tiled flash-attention Pallas kernels for the large attention levels.

The whole-sequence fused kernel (ops/attention.py) needs the full (n, n)
logits block in VMEM, which caps it at ~1.3k tokens. The flagship 224² model
puts vanilla attention at 56² (3136 tokens × 512 ch) and 28² (784 × 1024)
(reference attn placement: src/models/encoder_decoder.py:256-266 — every
res block whose resolution is in attn_resolutions gets an AttnBlock). At
those shapes XLA's einsum path materializes the (b, n, n) fp32 softmax in
HBM — 1.26 GB per pass at n=3136, bs 32 — and stores it as a residual for
the backward pass, which is both the bandwidth bill and the reason the 224²
step can't hold activations without remat.

This module is the standard flash-attention decomposition, TPU-tiled:

  forward  — grid (b, n/BQ, n/BK), k innermost; online softmax with running
             (m, l) row statistics in VMEM scratch; writes the output block
             and the per-row logsumexp on the last k step. Nothing (n, n)
             ever touches HBM.
  backward — the FlashAttention-2 two-kernel split, recomputing p from the
             saved logsumexp:
               dkv: grid (b, n/BK, n/BQ), q innermost, accumulates dk/dv.
               dq : grid (b, n/BQ, n/BK), k innermost, accumulates dq.

Matmuls run in the input dtype (bf16 in the production model) with fp32
accumulation (`preferred_element_type`); softmax statistics, rescaling, and
all accumulators are fp32 — matching the einsum reference path's numerics
(ops/attention.py:reference_attention) to ~1e-2 in bf16 / 1e-5 in fp32.

Single-head, head_dim = channels — the model family's AttnBlock is one head
over the h·w token grid (reference encoder_decoder.py:68-107), so the usual
(batch, heads) grid collapses to (batch,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# A (BQ, BK) fp32 logits tile + two (B*, c) operand tiles per stage must fit
# VMEM alongside the fp32 accumulators; 512² tiles with c ≤ 1024 stay ~6-8MB.
_MAX_BLOCK = 512
_MAX_STREAM_BLOCK = 1024  # streamed (revisited-axis) operands may be larger
_MIN_BLOCK = 256  # smaller tiles underfeed the MXU — einsum wins there
_LANES = 128  # lse/delta are carried lane-replicated to stay (8,128)-tileable


def _pick_block(n: int, max_block: int | None = None) -> int | None:
    """Largest divisor of n that is ≤ max_block and a multiple of 16.

    Multiples of 16 keep the second-to-minor dim tileable for bf16 operands;
    requiring an exact divisor avoids masked tails (the token counts this
    model family produces — 784, 3136, 12544 = (h·w) of pow2×28 grids — all
    have rich ×16 divisors)."""
    for d in range(min(n, max_block or _MAX_BLOCK), 15, -1):
        if d % 16 == 0 and n % d == 0:
            return d
    return None


def _pick_streamed_block(n: int, c: int) -> int | None:
    """Block size for the STREAMED operand dim (the `arbitrary` grid axis).

    Bigger streamed blocks amortize Mosaic's per-grid-step overhead and feed
    the MXU longer contractions (measured on v5e: fwd 3136×512 went 7.3 →
    5.9 ms going 448 → 784-row k blocks). Capped so the (resident block ×
    streamed block) fp32 logits tile plus double-buffered operands stay
    within VMEM: ≤1024 rows at c ≤ 512, ≤512 above."""
    cap = _MAX_STREAM_BLOCK if c <= 512 else _MAX_BLOCK
    return _pick_block(n, cap)


def _require_blocks(n: int, c: int, where: str) -> tuple[int, int]:
    """(resident, streamed) block sizes, or a clear error.

    Direct flash_attention callers can bypass the _or_none envelope (tests,
    profilers); without this check an n with no ×16 divisor surfaces as an
    opaque TypeError inside pallas_call setup."""
    blk = _pick_block(n)
    sblk = _pick_streamed_block(n, c)
    if blk is None or sblk is None:
        raise ValueError(
            f"flash attention {where}: n={n} has no x16 block divisor "
            f"(c={c}); use flash_attention_or_none for dispatch or pad n"
        )
    return blk, sblk


def _flash_vmem_estimate(n: int, c: int, itemsize: int) -> int:
    """Worst-kernel (dkv) VMEM working set in bytes for the blocks that
    would be picked: streamed operands double-buffered (q/g/lse/delta),
    resident k/v + dk/dv outputs + fp32 accumulator scratch single-buffered,
    plus two (bq, bk) fp32 logits-tile temporaries."""
    bq = _pick_block(n)
    bk = _pick_streamed_block(n, c)
    if bq is None or bk is None:
        return 1 << 62
    streamed = 2 * (2 * bq * c * itemsize + 2 * bq * _LANES * 4)
    resident = 2 * bk * c * itemsize  # k, v
    outs = 2 * bk * c * itemsize  # dk, dv
    scratch = 2 * bk * c * 4
    tiles = 2 * bq * bk * 4
    return streamed + resident + outs + scratch + tiles


# Measured envelope headroom: the production 3136×512 bf16 shape estimates
# ~12 MB and compiles; wider channels (c ≥ 2048) blow the ~16 MB scoped VMEM
# and would fail at compile time instead of falling back — guard here.
_FLASH_VMEM_BUDGET = 14 * 1024 * 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def flash_attention_or_none(q: jax.Array, k: jax.Array, v: jax.Array):
    """(b, n, c) single-head attention via tiled flash kernels, or None.

    Envelope: TPU backend, c a multiple of 128 (lane-aligned head dim), and
    n divisible by a ×16 block of at least _MIN_BLOCK rows. The block floor
    keeps the MXU fed: measured on v5e bs 32 (ops/PERF_FLAGSHIP.md),
    3136×512 (448-row blocks) runs 1.9× faster fwd and at parity f+b while
    eliminating the 1.26 GB (b, n, n) residual; 784×1024 (112-row blocks,
    lane-padded 112→128 tiles) is SLOWER than the einsum path (7.4 vs
    5.5 ms f+b) and its residual is only 78 MB — so small-block shapes
    stay on einsum. A VMEM working-set estimate bounds the channel width:
    wide-c shapes (≥ ~2048 at these blocks) would fail Mosaic compilation
    rather than run, so they fall back to einsum like the fused kernel's
    _vmem_estimate guard does."""
    _, n, c = q.shape
    if not _on_tpu():
        return None
    if c % _LANES != 0:
        return None
    blk = _pick_block(n)
    if blk is None or blk < _MIN_BLOCK:
        return None
    if _flash_vmem_estimate(n, c, q.dtype.itemsize) > _FLASH_VMEM_BUDGET:
        return None
    return flash_attention(q, k, v)


@jax.custom_vjp
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    # Primal path (inference/eval — no grad trace): skip the lse output
    # entirely. The lane-replicated (b, n, _LANES) fp32 logsumexp is ~51 MB
    # of HBM writes at the 3136×512 bs32 shape and is only a backward-pass
    # carrier; the VJP fwd rule below stores it instead.
    return _flash_fwd_kernel(q, k, v, want_lse=False)


def _flash_fwd(q, k, v):
    out, lse = _flash_fwd_kernel(q, k, v, want_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(res, g):
    q, k, v, out, lse = res
    # delta[b, i] = Σ_c dO[b, i, c] · O[b, i, c] — the softmax-jacobian row
    # term. Cheap (one (b, n, c) pass), so computed in XLA and streamed in
    # lane-replicated like lse.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dk, dv = _flash_dkv_kernel(q, k, v, g, lse, delta)
    dq = _flash_dq_kernel(q, k, v, g, lse, delta)
    return dq, dk, dv


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def _rep(x: jax.Array) -> jax.Array:
    """(b, n) → (b, n, _LANES) lane-replicated fp32 carrier."""
    return jnp.broadcast_to(x.astype(jnp.float32)[..., None], (*x.shape, _LANES))


def _dot_nt(a, b, dtype):
    """(m, c) · (n, c)ᵀ → (m, n), accumulating fp32."""
    return jax.lax.dot_general(
        a.astype(dtype),
        b.astype(dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _dot_tn(a, b, dtype):
    """(m, n)ᵀ · (m, c) → (n, c), accumulating fp32."""
    return jax.lax.dot_general(
        a.astype(dtype),
        b.astype(dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _vmem_spec():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    return spec


def _flash_fwd_kernel(q: jax.Array, k: jax.Array, v: jax.Array,
                      want_lse: bool = True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = q.shape
    bq, bk = _require_blocks(n, c, "forward")
    nq, nk = n // bq, n // bk
    scale = float(c) ** -0.5
    in_dtype = q.dtype

    def kernel(q_ref, k_ref, v_ref, o_ref, *rest):
        lse_ref, (acc, m_s, l_s) = (
            (rest[0], rest[1:]) if want_lse else (None, rest)
        )
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            m_s[:] = jnp.full_like(m_s, -jnp.inf)
            l_s[:] = jnp.zeros_like(l_s)

        s = _dot_nt(q_ref[0], k_ref[0], in_dtype) * scale  # (bq, bk) fp32
        m_prev = m_s[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_new = alpha * l_s[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc[:] = acc[:] * alpha + jnp.dot(
            p.astype(in_dtype), v_ref[0].astype(in_dtype),
            preferred_element_type=jnp.float32,
        )
        m_s[:] = jnp.broadcast_to(m_new, m_s.shape)
        l_s[:] = jnp.broadcast_to(l_new, l_s.shape)

        @pl.when(ik == nk - 1)
        def _():
            o_ref[0] = (acc[:] / l_s[:, :1]).astype(o_ref.dtype)
            if want_lse:
                lse_ref[0] = m_s[:] + jnp.log(l_s[:])

    spec = _vmem_spec()
    out_specs = [spec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, n, c), q.dtype)]
    if want_lse:
        out_specs.append(spec((1, bq, _LANES), lambda ib, iq, ik: (ib, iq, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, n, _LANES), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            spec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),  # q
            spec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),  # k
            spec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),  # v
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bq, c), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return (outs[0], outs[1]) if want_lse else outs[0]


def _flash_dkv_kernel(q, k, v, g, lse, delta):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = q.shape
    bk, bq = _require_blocks(n, c, "backward dkv")
    nq, nk = n // bq, n // bk
    scale = float(c) ** -0.5
    in_dtype = q.dtype

    def kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref, dk_ref, dv_ref,
               dk_acc, dv_acc):
        iq = pl.program_id(2)

        @pl.when(iq == 0)
        def _():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

        s = _dot_nt(q_ref[0], k_ref[0], in_dtype) * scale  # (bq, bk)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dv_acc[:] += _dot_tn(p, g_ref[0], in_dtype)  # (bk, c)
        dp = _dot_nt(g_ref[0], v_ref[0], in_dtype)  # (bq, bk)
        ds = p * (dp - d_ref[0][:, :1]) * scale
        dk_acc[:] += _dot_tn(ds, q_ref[0], in_dtype)  # (bk, c)

        @pl.when(iq == nq - 1)
        def _():
            dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)

    spec = _vmem_spec()
    dk, dv = pl.pallas_call(
        kernel,
        grid=(b, nk, nq),
        in_specs=[
            spec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),       # q
            spec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),       # k
            spec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),       # v
            spec((1, bq, c), lambda ib, ik, iq: (ib, iq, 0)),       # dO
            spec((1, bq, _LANES), lambda ib, ik, iq: (ib, iq, 0)),  # lse
            spec((1, bq, _LANES), lambda ib, ik, iq: (ib, iq, 0)),  # delta
        ],
        out_specs=[
            spec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
            spec((1, bk, c), lambda ib, ik, iq: (ib, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), k.dtype),
            jax.ShapeDtypeStruct((b, n, c), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, c), jnp.float32),
            pltpu.VMEM((bk, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, _rep(lse) if lse.ndim == 2 else lse, _rep(delta))
    return dk, dv


def _flash_dq_kernel(q, k, v, g, lse, delta):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = q.shape
    bq, bk = _require_blocks(n, c, "backward dq")
    nq, nk = n // bq, n // bk
    scale = float(c) ** -0.5
    in_dtype = q.dtype

    def kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, d_ref, dq_ref, dq_acc):
        ik = pl.program_id(2)

        @pl.when(ik == 0)
        def _():
            dq_acc[:] = jnp.zeros_like(dq_acc)

        s = _dot_nt(q_ref[0], k_ref[0], in_dtype) * scale  # (bq, bk)
        p = jnp.exp(s - lse_ref[0][:, :1])
        dp = _dot_nt(g_ref[0], v_ref[0], in_dtype)  # (bq, bk)
        ds = p * (dp - d_ref[0][:, :1]) * scale
        dq_acc[:] += jnp.dot(
            ds.astype(in_dtype), k_ref[0].astype(in_dtype),
            preferred_element_type=jnp.float32,
        )

        @pl.when(ik == nk - 1)
        def _():
            dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)

    spec = _vmem_spec()
    (dq,) = pl.pallas_call(
        kernel,
        grid=(b, nq, nk),
        in_specs=[
            spec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),       # q
            spec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),       # k
            spec((1, bk, c), lambda ib, iq, ik: (ib, ik, 0)),       # v
            spec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0)),       # dO
            spec((1, bq, _LANES), lambda ib, iq, ik: (ib, iq, 0)),  # lse
            spec((1, bq, _LANES), lambda ib, iq, ik: (ib, iq, 0)),  # delta
        ],
        out_specs=[spec((1, bq, c), lambda ib, iq, ik: (ib, iq, 0))],
        out_shape=[jax.ShapeDtypeStruct((b, n, c), q.dtype)],
        scratch_shapes=[pltpu.VMEM((bq, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v, g, _rep(lse) if lse.ndim == 2 else lse, _rep(delta))
    return dq
