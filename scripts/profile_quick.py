#!/usr/bin/env python
"""Op-level measurement of the 28x28 north-star config on the live TPU.

The 28x28 quick config (hidden 32, ch_mult 1-2-4, bs 4096) runs at ~32% MFU
(BENCH); PERF_224.md attributes that to lane underfill at small channel
counts (C_out < 128 uses only C_out of the MXU's 128 columns). This script
measures, per level of the quick architecture:
  * 3x3 conv fwd+bwd achieved TFLOP/s at the native layout
  * the same conv reformulated via 2x2 space-to-depth (C_in/C_out x4,
    kernel 2x2, half resolution -- mathematically the same linear map on
    a shifted support, used here only as an upper-bound probe of what
    lane-filling would buy; 16/9 FLOPs overhead is included in the
    reported effective TF/s so the numbers are comparable end-to-end)
so we can decide whether an s2d conv path is worth building.

Timing fence: jax.device_get of a value (tunneled-backend safe).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK = 197e12
BS = int(os.environ.get("PROFILE_BATCH", 4096))
REPS = int(os.environ.get("PROFILE_REPS", 30))

# (spatial, channels) of the quick config's conv-heavy levels
LEVELS = [(28, 32), (14, 64), (7, 128)]


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
    key = jax.random.PRNGKey(0)
    print(f"BS={BS}, reps={REPS}, device={jax.devices()[0].device_kind}")

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
        fl = 3 * conv_flops(hw, c, c)
        print(f"conv3x3 {hw}x{hw}x{c:<4} f+b          "
              f"{t*1e3:8.2f} ms  {fl/t/1e12:7.1f} TF/s  {100*fl/t/PEAK:5.1f}% peak")

        # --- s2d probe: same useful work expressed as 2x2-s2d conv ---
        # x (B,hw,hw,C) -> (B,hw/2,hw/2,4C); 3x3 stride-1 conv becomes a
        # 2x2 conv in s2d space producing 4C outputs (4 spatial phases).
        if hw % 2 == 0:
            xs = x.reshape(BS, hw // 2, 2, hw // 2, 2, c).transpose(
                0, 1, 3, 2, 4, 5).reshape(BS, hw // 2, hw // 2, 4 * c)
            ws = jax.random.normal(key, (2, 2, 4 * c, 4 * c), jnp.bfloat16) * 0.02

            @jax.jit
            def s2d_vjp(x, w):
                def f(x, w):
                    return jnp.sum(
                        jax.lax.conv_general_dilated(
                            x, w, (1, 1), "SAME",
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        ).astype(jnp.float32)
                    )
                return jax.grad(f, argnums=(0, 1))(x, w)

            ts = timeit(s2d_vjp, xs, ws)
            # useful FLOPs = the original conv's; the s2d form does 16/9 more
            print(f"  s2d2 form (2x2 conv {hw//2}^2x{4*c}) "
                  f"{ts*1e3:8.2f} ms  effective {fl/ts/1e12:7.1f} TF/s "
                  f"({conv_flops(hw//2, 4*c, 4*c, 2)*3/ts/1e12:6.1f} raw) "
                  f"speedup x{t/ts:4.2f}")

        # --- wide-batch 1x1 probe: how fast is a pure matmul at this C ---
        @jax.jit
        def mm_vjp(x, w):
            def f(x, w):
                return jnp.sum((x.reshape(-1, c) @ w).astype(jnp.float32))
            return jax.grad(f, argnums=(0, 1))(x, jnp.eye(c, dtype=jnp.bfloat16))

        tm = timeit(mm_vjp, x, w)
        flm = 3 * 2 * BS * hw * hw * c * c
        print(f"  1x1-matmul probe {hw}^2x{c}      "
              f"{tm*1e3:8.2f} ms  {flm/tm/1e12:7.1f} TF/s  {100*flm/tm/PEAK:5.1f}% peak")

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
