#!/usr/bin/env python
"""Op-level measurement of the full-size 224 config on the live TPU.

VERDICT r1 item 5: profile the 224 config, identify the top HBM/MXU consumers,
and decide the fused-resblock Pallas question WITH DATA. This measures, per
encoder level of the 224 architecture (hidden 128, ch_mult 1-2-4-8):
  * 3x3 conv fwd+bwd achieved TFLOP/s (is XLA's conv near peak?)
  * GroupNorm+SiLU fwd+bwd: XLA vs the Pallas fused kernel
  * mid-block attention (784 tokens x 1024 ch) fwd+bwd: XLA einsum path
    (the Pallas kernel's single-block-per-batch-row design exceeds VMEM at
    784 tokens; noted in output)
plus the measured step-level MFU for context. Prints one table; results are
recorded in medvae_tpu/ops/PERF_224.md.

Timing fence: jax.device_get of a value (tunneled-backend safe).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK = 197e12  # v5e bf16 TFLOP/s
BS = int(os.environ.get("PROFILE_BATCH", 32))
REPS = int(os.environ.get("PROFILE_REPS", 30))

# encoder levels of the 224 config: (spatial, channels)
LEVELS = [(224, 128), (112, 256), (56, 512), (28, 1024)]


def timeit(fn, *args):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS


def conv_flops(hw, cin, cout, k=3):
    return 2 * BS * hw * hw * k * k * cin * cout


def main() -> int:
    rows = []
    key = jax.random.PRNGKey(0)

    for hw, c in LEVELS:
        x = jax.random.normal(key, (BS, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16) * 0.02

        @jax.jit
        def conv_vjp(x, w):
            def f(x, w):
                return jnp.sum(
                    jax.lax.conv_general_dilated(
                        x, w, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ).astype(jnp.float32)
                )
            return jax.grad(f, argnums=(0, 1))(x, w)

        t = timeit(conv_vjp, x, w)
        fl = 3 * conv_flops(hw, c, c)  # fwd + dx + dw
        rows.append(
            (f"conv3x3 {hw}x{hw}x{c} f+b", t * 1e3, fl / t / 1e12,
             100 * fl / t / PEAK)
        )

        # GroupNorm(32)+SiLU: XLA vs Pallas fused
        scale = jnp.ones((c,), jnp.float32)
        bias = jnp.zeros((c,), jnp.float32)

        def gn_xla(x, scale, bias):
            xf = x.astype(jnp.float32)
            g = 32
            b_, h_, w_, c_ = xf.shape
            xg = xf.reshape(b_, h_ * w_, g, c_ // g)
            mu = jnp.mean(xg, axis=(1, 3), keepdims=True)
            var = jnp.var(xg, axis=(1, 3), keepdims=True)
            xn = ((xg - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(xf.shape)
            y = xn * scale + bias
            return (y * jax.nn.sigmoid(y)).astype(x.dtype)

        @jax.jit
        def gn_xla_vjp(x, s, b):
            return jax.grad(
                lambda x, s, b: jnp.sum(gn_xla(x, s, b).astype(jnp.float32)),
                argnums=(0, 1, 2),
            )(x, s, b)

        t_xla = timeit(gn_xla_vjp, x, scale, bias)
        row = ["GN", f"GN+SiLU {hw}x{hw}x{c} f+b", t_xla * 1e3]

        try:
            from medvae_tpu.ops.groupnorm_swish import fused_group_norm_swish

            @jax.jit
            def gn_pl_vjp(x, s, b):
                return jax.grad(
                    lambda x, s, b: jnp.sum(
                        fused_group_norm_swish(x, s, b, 32, 1e-6).astype(
                            jnp.float32
                        )
                    ),
                    argnums=(0, 1, 2),
                )(x, s, b)

            t_pl = timeit(gn_pl_vjp, x, scale, bias)
            row += [t_pl * 1e3, t_xla / t_pl]
        except Exception as e:
            row += [float("nan"), float("nan")]
            print(f"pallas GN failed at {hw}x{c}: {type(e).__name__}: {e}")
        rows.append(tuple(row))

    # mid-block attention: 28x28=784 tokens, 1024 ch (the only attention in
    # the 224 config; fires in mid + nowhere else since curr_res hits
    # 224/112/56/28 and attn_resolutions=[16] never matches -> reference
    # quirk, attention comes from the mid block)
    n, c = 784, 1024
    q = jax.random.normal(key, (BS, n, c), jnp.bfloat16)

    def attn_xla(q, k, v):
        scale = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
        logits = jnp.einsum("bnc,bmc->bnm", q, k).astype(jnp.float32) * scale
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bnm,bmc->bnc", p, v)

    @jax.jit
    def attn_vjp(q, k, v):
        return jax.grad(
            lambda q, k, v: jnp.sum(attn_xla(q, k, v).astype(jnp.float32)),
            argnums=(0, 1, 2),
        )(q, k, v)

    t = timeit(attn_vjp, q, q, q)
    fl = 3 * (2 * 2 * BS * n * n * c)  # ~fwd(2 bmm) + bwd(2x)
    rows.append((f"attention {n}tok x{c} f+b (XLA)", t * 1e3, fl / t / 1e12,
                 100 * fl / t / PEAK))
    from medvae_tpu.ops.attention import _vmem_estimate, _VMEM_BUDGET

    print(
        f"# pallas fused attention envelope: needs {_vmem_estimate(n, c)/2**20:.0f} "
        f"MiB VMEM > {_VMEM_BUDGET/2**20:.0f} MiB budget -> gated off at this shape"
    )

    print(f"\nBS={BS}, reps={REPS}, device={jax.devices()[0].device_kind}")
    for r in rows:
        if r[0] == "GN":
            print(f"{r[1]:<38} XLA {r[2]:8.2f} ms   pallas {r[3]:8.2f} ms   "
                  f"speedup x{r[4]:.2f}")
        else:
            print(f"{r[0]:<38} {r[1]:8.2f} ms   {r[2]:7.1f} TF/s  {r[3]:5.1f}% peak")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
