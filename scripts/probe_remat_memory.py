"""Map compiled HBM peaks of the 224^2 CVAE train step across (remat, batch).

AOT-only: lowers + compiles each (remat mode, batch size) combination and
reads XLA's memory_analysis() without executing a step, so OOM configs are
diagnosed rather than crashed into. Answers the PERF_224.md question of why
remat='conv' can exceed no-remat peak memory (the saved named conv outputs
plus XLA's scheduling freedom loss can beat vanilla XLA's own choices).

Usage:  python scripts/probe_remat_memory.py [bs ...]
Env:    PROBE_REMATS=none,conv,block (default)  BENCH_MODEL=cvae|flagship
"""

import os
import sys

os.environ.setdefault("BENCH_CONFIG", "full224")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (waits for the tunneled backend, imports jax)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from medvae_tpu.core.mesh import create_mesh  # noqa: E402


def probe(remat_mode: str, bs: int) -> dict:
    os.environ["BENCH_REMAT"] = "" if remat_mode == "none" else remat_mode
    mesh = create_mesh()
    model, step, state, size = bench._build(mesh)
    batch = jax.device_put(
        {
            k: (jnp.asarray(v) if not isinstance(v, np.ndarray) else jnp.asarray(v))
            for k, v in bench._synthetic_batch(bs, size).items()
        }
    )
    rng = jax.random.PRNGKey(0)
    try:
        compiled = step.lower(state, batch, rng).compile()
    except Exception as e:  # compile-time RESOURCE_EXHAUSTED etc.
        msg = str(e).splitlines()[0][:160]
        return {"remat": remat_mode, "bs": bs, "error": msg}
    ma = compiled.memory_analysis()
    if isinstance(ma, (list, tuple)):
        ma = ma[0]
    gib = 1024.0**3
    out = {"remat": remat_mode, "bs": bs}
    for attr in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
        "generated_code_size_in_bytes",
    ):
        v = getattr(ma, attr, None)
        if v is not None:
            out[attr.replace("_size_in_bytes", "_gib")] = round(v / gib, 3)
    # peak = args + temp (outputs alias donated args where possible)
    try:
        out["peak_gib"] = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes) / gib, 3
        )
    except Exception:
        pass
    return out


def main() -> None:
    batches = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    remats = os.environ.get("PROBE_REMATS", "none,conv,block").split(",")
    print(f"devices: {jax.devices()}")
    for remat_mode in remats:
        for bs in batches:
            row = probe(remat_mode, bs)
            print(row, flush=True)


if __name__ == "__main__":
    main()
