#!/usr/bin/env python
"""Serving benchmark: InferenceEngine throughput + latency on the device.

The reference framework has no serving story (its closest surfaces are the
one-shot generate.py / evaluate.py scripts); `medvae_tpu.serve` is the
production-deployment layer this build adds, and this script is its perf
artifact — the serving analogue of `bench.py`'s training numbers.

Measured per (surface, method, bucket), on whatever backend JAX resolves
(TPU in production; `--tiny` runs the same code on CPU for the test tier):

  * batch throughput (img/s) and ms/batch at every shipped bucket size for
    reconstruct / encode / decode / sample — each is its own cached XLA
    executable (engine.warmup precompiles all of them, nothing in the timed
    region ever compiles);
  * single-image request latency (p50/p99) through the bucket-1 executable;
  * MicroBatcher end-to-end: concurrent single-image clients against the
    coalescing frontend — achieved req/s plus p50/p99 client-observed
    latency, the actual serving configuration (latency-bound batching).

Timing is host-observed wall clock around the engine's public methods,
which device_get their results — transfers and padding overhead are *in*
the number, as a serving client would see them. Steady-state: each cell is
timed over >= `--reps` calls after 2 warm calls, median reported.

Usage:
    python scripts/bench_serve.py                       # both surfaces
    python scripts/bench_serve.py --surface quick28     # one surface
    python scripts/bench_serve.py --tiny                # CPU smoke (tests)

Writes `--out`/results.json (one document, all cells) and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_from_experiment(experiment: str, buckets):
    """Model + fresh params + engine for a shipped experiment config.

    Serving throughput is weight-independent (same graph, same shapes), so
    freshly initialized params measure exactly what a trained checkpoint
    would; `InferenceEngine.from_checkpoint` is the deployment path.
    """
    import jax
    import jax.numpy as jnp

    from medvae_tpu.cli.train import default_config_dir
    from medvae_tpu.config.compose import compose
    from medvae_tpu.models import ConditionalVAE, DisentangledConditionalVAE
    from medvae_tpu.train.trainer import build_model
    from medvae_tpu.serve import InferenceEngine

    cfg = compose(default_config_dir(), "config", [f"experiment={experiment}"])
    model = build_model(
        cfg["model"],
        precision=cfg.get("precision", "bf16"),
        use_pallas=bool(cfg.get("use_pallas", True)),
    )
    res = int(model.resolution)
    c = int(getattr(model, "max_channels", 0) or model.input_channels)
    x = jnp.zeros((2, res, res, c), model.dtype)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "sample": jax.random.PRNGKey(1),
    }
    if isinstance(model, DisentangledConditionalVAE):
        variables = jax.jit(model.init)(rngs, x, jnp.zeros((2,), jnp.int32))
    elif isinstance(model, ConditionalVAE):
        cond = jnp.zeros((2, model.cond_dim), model.dtype)
        variables = jax.jit(model.init)(rngs, x, cond)
    else:
        variables = jax.jit(model.init)(rngs, x)
    params = variables["params"]
    return model, InferenceEngine(model, params, buckets=buckets)


def _build_tiny(buckets):
    import jax
    import jax.numpy as jnp

    from medvae_tpu.models import ConditionalVAE
    from medvae_tpu.serve import InferenceEngine

    model = ConditionalVAE(
        input_channels=3, num_modalities=5, latent_dim=4, hidden_channels=8,
        ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(), resolution=16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, model.cond_dim)),
    )
    return model, InferenceEngine(model, variables["params"], buckets=buckets)


def _timed(fn, reps: int, min_seconds: float):
    """Median seconds/call over >= reps calls (>= min_seconds total)."""
    fn()
    fn()  # two warm calls: past any lazy host-side setup
    times = []
    t_total0 = time.perf_counter()
    while len(times) < reps or time.perf_counter() - t_total0 < min_seconds:
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if len(times) >= 10 * reps:
            break
    return statistics.median(times), times


def _pctl(xs, q):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(round(q * (len(xs) - 1))))]


def bench_surface(name: str, engine, reps: int, min_seconds: float):
    res = int(engine.model.resolution)
    c = int(
        getattr(engine.model, "max_channels", 0) or engine.model.input_channels
    )
    rs = np.random.RandomState(0)
    n_exec = engine.warmup()
    out = {
        "surface": name,
        "model": engine.info()["model"],
        "resolution": res,
        "buckets": list(engine.buckets),
        "executables_precompiled": n_exec,
        "cells": [],
    }

    for b in engine.buckets:
        x = rs.randint(0, 255, (b, res, res, c), np.uint8)
        mods = rs.randint(0, 5, (b,), np.int32)
        mean, _ = engine.encode(x, modality=mods)
        for method, fn in (
            ("reconstruct", lambda: engine.reconstruct(x, modality=mods)),
            ("encode", lambda: engine.encode(x, modality=mods)),
            ("decode", lambda: engine.decode(mean, modality=mods)),
            ("sample", lambda: engine.sample(b, modality=mods, seed=0)),
        ):
            sec, _ = _timed(fn, reps, min_seconds)
            out["cells"].append(
                {
                    "method": method,
                    "bucket": b,
                    "ms_per_batch": round(sec * 1e3, 3),
                    "images_per_sec": round(b / sec, 1),
                }
            )

    # single-image latency through the bucket-1 executable
    x1 = rs.randint(0, 255, (1, res, res, c), np.uint8)
    _, times = _timed(
        lambda: engine.reconstruct(x1, modality=np.zeros((1,), np.int32)),
        max(reps, 50),
        min_seconds,
    )
    out["single_image_latency_ms"] = {
        "p50": round(_pctl(times, 0.50) * 1e3, 3),
        "p99": round(_pctl(times, 0.99) * 1e3, 3),
        "n": len(times),
    }
    return out


def bench_microbatcher(engine, clients: int, per_client: int,
                       max_batch: int, max_delay_ms: float):
    """Concurrent single-image clients through the coalescing frontend."""
    from medvae_tpu.serve import MicroBatcher

    res = int(engine.model.resolution)
    c = int(
        getattr(engine.model, "max_channels", 0) or engine.model.input_channels
    )
    rs = np.random.RandomState(1)
    imgs = rs.randint(0, 255, (clients, res, res, c), np.uint8)
    mb = MicroBatcher(engine, max_batch=max_batch, max_delay_ms=max_delay_ms)
    # warm the coalesced-bucket executables through the batcher itself
    for f in [mb.submit(imgs[i % clients]) for i in range(max_batch)]:
        f.result(timeout=120)

    lat, lock = [], threading.Lock()

    def client(i):
        for _ in range(per_client):
            t0 = time.perf_counter()
            mb.submit(imgs[i], modality=int(i % 5)).result(timeout=120)
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    mb.close()
    total = clients * per_client
    return {
        "clients": clients,
        "requests": total,
        "max_batch": max_batch,
        "max_delay_ms": max_delay_ms,
        "achieved_req_per_sec": round(total / wall, 1),
        "latency_ms": {
            "p50": round(_pctl(lat, 0.50) * 1e3, 3),
            "p99": round(_pctl(lat, 0.99) * 1e3, 3),
        },
    }


SURFACES = {
    # 28² conditional CVAE — the high-throughput serving shape
    "quick28": ("multi_modal_cvae_quick", (1, 8, 32, 128, 512)),
    # 224² flagship — the heavyweight; attention levels ride the flash
    # kernels' forward-only path (want_lse=False, no residual writes)
    "flagship224": ("disentangled_multi_modal_cvae_full", (1, 8, 32)),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--surface", choices=[*SURFACES, "all"], default="all")
    ap.add_argument("--out", default="logs/serve_bench")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--min-seconds", type=float, default=3.0)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny CPU model (test tier; no shipped configs)")
    args = ap.parse_args()

    import jax

    results = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "surfaces": [],
    }
    if args.tiny:
        model, engine = _build_tiny((1, 4))
        r = bench_surface("tiny16", engine, reps=3, min_seconds=0.0)
        r["microbatcher"] = bench_microbatcher(
            engine, clients=4, per_client=3, max_batch=4, max_delay_ms=2.0
        )
        results["surfaces"].append(r)
    else:
        names = list(SURFACES) if args.surface == "all" else [args.surface]
        for name in names:
            experiment, buckets = SURFACES[name]
            print(f"[bench_serve] building {name} ({experiment}) ...", flush=True)
            model, engine = _build_from_experiment(experiment, buckets)
            print(f"[bench_serve] warmup + timing {name} ...", flush=True)
            r = bench_surface(name, engine, args.reps, args.min_seconds)
            r["experiment"] = experiment
            mb_batch = 32 if name == "quick28" else 8
            r["microbatcher"] = bench_microbatcher(
                engine, clients=16, per_client=8,
                max_batch=mb_batch, max_delay_ms=2.0,
            )
            results["surfaces"].append(r)

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "results.json"
    path.write_text(json.dumps(results, indent=2))

    for r in results["surfaces"]:
        print(f"\n== {r['surface']} ({r['model']} @ {r['resolution']}²) ==")
        for cell in r["cells"]:
            print(
                f"  {cell['method']:<11} bs {cell['bucket']:>4}: "
                f"{cell['ms_per_batch']:>9.2f} ms/batch  "
                f"{cell['images_per_sec']:>10.1f} img/s"
            )
        lat = r["single_image_latency_ms"]
        print(f"  single-image latency p50 {lat['p50']} ms  p99 {lat['p99']} ms")
        mb = r["microbatcher"]
        print(
            f"  microbatcher {mb['clients']} clients: "
            f"{mb['achieved_req_per_sec']} req/s, "
            f"p50 {mb['latency_ms']['p50']} ms p99 {mb['latency_ms']['p99']} ms"
        )
    print(f"\n[bench_serve] wrote {path}")


if __name__ == "__main__":
    main()
