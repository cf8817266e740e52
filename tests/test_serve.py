"""Serving subsystem: engine bucketing/dispatch, micro-batcher, AOT export,
HTTP front end.

The engine's contract: any request size in, exactly that many results out,
numerically identical to a direct posterior-mean model.apply — bucketing and
padding must be invisible. Export round-trips through jax.export without the
model's Python class. The HTTP server is exercised end-to-end on localhost.
"""

import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medvae_tpu.models import BaseVAE, ConditionalVAE, DisentangledConditionalVAE
from medvae_tpu.serve import (

    InferenceEngine,
    MicroBatcher,
    export_model,
    load_exported,
    to_uint8,
)

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow

TINY = dict(
    latent_dim=4,
    hidden_channels=8,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(),
    dropout=0.0,
    resolution=16,
)


def _base_engine(buckets=(2, 4)):
    model = BaseVAE(input_channels=3, **TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
    )
    return model, variables["params"], InferenceEngine(
        model, variables["params"], buckets=buckets
    )


def _dis_engine(buckets=(2, 4)):
    model = DisentangledConditionalVAE(
        num_modalities=5, shared_latent_dim=4, modality_latent_dim=4,
        hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), resolution=16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1,), jnp.int32),
    )
    return model, variables["params"], InferenceEngine(
        model, variables["params"], buckets=buckets
    )


def test_reconstruct_matches_direct_apply_and_padding_invisible():
    model, params, eng = _base_engine(buckets=(2, 4))
    rs = np.random.RandomState(0)
    x_u8 = rs.randint(0, 255, (3, 16, 16, 3), np.uint8)  # 3 -> pads to 4
    got = eng.reconstruct(x_u8)
    assert got.shape == (3, 16, 16, 3)

    x = x_u8.astype(np.float32) / 255.0 * 2.0 - 1.0
    mean, _ = model.apply({"params": params}, jnp.asarray(x), method=model.encode)
    want = model.apply(
        {"params": params}, mean.astype(model.dtype), method=model.decode
    )
    np.testing.assert_allclose(got, np.asarray(want, np.float32), atol=1e-5)


def test_chunking_covers_requests_larger_than_biggest_bucket():
    _, _, eng = _base_engine(buckets=(2, 4))
    x = np.zeros((11, 16, 16, 3), np.uint8)  # 4 + 4 + 3(pad to 4)
    out = eng.reconstruct(x)
    assert out.shape[0] == 11
    chunks = list(eng._chunks(11))
    assert chunks == [(0, 4, 4), (4, 4, 4), (8, 3, 4)]


def test_encode_decode_roundtrip_disentangled_modality_routing():
    model, params, eng = _dis_engine()
    rs = np.random.RandomState(1)
    x = rs.randint(0, 255, (4, 16, 16, 3), np.uint8)
    midx = np.array([0, 1, 2, 3], np.int32)
    mean, logvar = eng.encode(x, modality=midx)
    assert mean.shape[0] == 4 and logvar.shape == mean.shape
    rec = eng.decode(mean, modality=midx)
    assert rec.shape == (4, 16, 16, 3)
    # engine reconstruct == encode-then-decode (posterior mean path)
    np.testing.assert_allclose(
        eng.reconstruct(x, modality=midx), rec, atol=1e-5
    )
    # modality routing is live: a different modality changes the output
    rec_other = eng.decode(mean, modality=np.array([4, 4, 4, 4], np.int32))
    assert np.abs(rec - rec_other).max() > 1e-6


def test_sample_shapes_and_seed_determinism():
    _, _, eng = _dis_engine()
    a = eng.sample(3, modality="octmnist", seed=7)
    b = eng.sample(3, modality="octmnist", seed=7)
    c = eng.sample(3, modality="octmnist", seed=8)
    assert a.shape == (3, 16, 16, 3)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-6


def test_modality_string_and_scalar_broadcast():
    _, _, eng = _dis_engine()
    x = np.zeros((2, 16, 16, 3), np.uint8)
    by_name = eng.reconstruct(x, modality="pathmnist")
    by_idx = eng.reconstruct(x, modality=np.array([1], np.int32))
    np.testing.assert_allclose(by_name, by_idx, atol=0)


def test_reconstruct_output_uint8_matches_host_conversion():
    """output="uint8" must equal converting the float32 result on host
    ([-1,1] -> round -> clip to [0,255]); same for sample. Keeps the
    device-side conversion (4x smaller result transfers) exact."""
    _, _, eng = _base_engine(buckets=(4,))
    rs = np.random.RandomState(1)
    x_u8 = rs.randint(0, 255, (4, 16, 16, 3), np.uint8)
    f = eng.reconstruct(x_u8)
    u = eng.reconstruct(x_u8, output="uint8")
    assert u.dtype == np.uint8
    np.testing.assert_array_equal(
        u, np.clip(np.round((f + 1.0) * 127.5), 0, 255).astype(np.uint8)
    )
    s_f = eng.sample(3, seed=7)
    s_u = eng.sample(3, seed=7, output="uint8")
    assert s_u.dtype == np.uint8
    np.testing.assert_array_equal(
        s_u, np.clip(np.round((s_f + 1.0) * 127.5), 0, 255).astype(np.uint8)
    )


def test_to_uint8_range():
    x = np.array([-1.0, 0.0, 1.0, 2.0, -2.0], np.float32)
    out = to_uint8(x)
    assert out.dtype == np.uint8
    # 0.0 -> 127.5 -> rounds (half-to-even) to 128, matching the device path
    np.testing.assert_array_equal(out, [0, 128, 255, 255, 0])


def test_warmup_and_info():
    _, _, eng = _base_engine(buckets=(1, 2))
    # 2 buckets x (reconstruct, encode, decode, sample) — encode/decode have
    # their own executables, warmup must touch all four
    assert eng.warmup() == 8
    info = eng.info()
    assert info["model"] == "BaseVAE"
    assert info["resolution"] == 16
    assert info["buckets"] == [1, 2]


def test_info_reports_real_latent_for_disentangled():
    _, _, eng = _dis_engine()
    # total_latent_dim (shared 4 + modality 4), not the inherited unused
    # BaseVAE.latent_dim default
    assert eng.info()["latent_dim"] == 8


def test_conditional_vae_nondefault_cond_dim():
    """The one-hot width must follow the model's cond_dim, not a fixed 12."""
    model = ConditionalVAE(
        input_channels=3, condition_method="concat",
        modalities=["chestmnist", "pathmnist", "octmnist"], **TINY
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, model.cond_dim)),
    )
    eng = InferenceEngine(model, variables["params"], buckets=(2,))
    assert model.cond_dim == 3
    x = np.zeros((2, 16, 16, 3), np.uint8)
    out = eng.reconstruct(x, modality=np.array([0, 2], np.int32))
    assert out.shape == (2, 16, 16, 3)
    # /info must advertise only this model's condition width, and indices
    # beyond it are rejected, not silently clipped to the last modality
    assert len(eng.info()["modalities"]) == 3
    with pytest.raises(ValueError, match="out of range"):
        eng.reconstruct(x, modality=np.array([0, 11], np.int32))


def test_microbatcher_coalesces_and_matches_engine():
    _, _, eng = _dis_engine(buckets=(1, 2, 4))
    mb = MicroBatcher(eng, max_batch=4, max_delay_ms=30.0)
    try:
        rs = np.random.RandomState(2)
        imgs = rs.randint(0, 255, (4, 16, 16, 3), np.uint8)
        futs = [mb.submit(imgs[i], modality=i % 5) for i in range(4)]
        got = np.stack([f.result(timeout=30) for f in futs])
        want = eng.reconstruct(imgs, modality=np.arange(4, dtype=np.int32) % 5)
        np.testing.assert_allclose(got, want, atol=1e-5)
    finally:
        mb.close()


def test_microbatcher_survives_bad_requests_and_accepts_names():
    """Ragged shapes / bad modality names must fail their own batch's
    futures and leave the batcher thread alive for later requests."""
    _, _, eng = _dis_engine(buckets=(1, 2, 4))
    mb = MicroBatcher(eng, max_batch=2, max_delay_ms=20.0)
    try:
        good = np.zeros((16, 16, 3), np.uint8)
        bad = np.zeros((8, 8, 3), np.uint8)  # ragged vs good -> stack fails
        f1 = mb.submit(good)
        f2 = mb.submit(bad)
        excs = [f.exception(timeout=30) for f in (f1, f2)]
        assert any(e is not None for e in excs)
        # thread still alive: a clean follow-up request succeeds, and
        # string modalities route like engine.reconstruct's
        f3 = mb.submit(good, modality="pathmnist")
        out = f3.result(timeout=30)
        want = eng.reconstruct(good[None], modality="pathmnist")[0]
        np.testing.assert_allclose(out, want, atol=1e-5)
    finally:
        mb.close()


def test_microbatcher_close_fails_queued_futures():
    _, _, eng = _dis_engine(buckets=(1,))
    mb = MicroBatcher(eng, max_batch=1, max_delay_ms=1.0)
    mb.close()
    # post-close submits are rejected outright
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((16, 16, 3), np.uint8))
    # anything force-queued before close resolution gets an exception, not a hang
    from concurrent.futures import Future

    fut = Future()
    mb._q.put((np.zeros((16, 16, 3), np.uint8), None, fut))
    mb.close()
    assert isinstance(fut.exception(timeout=5), RuntimeError)


def test_export_roundtrip_matches_engine(tmp_path):
    model, params, eng = _dis_engine(buckets=(4,))
    meta = export_model(model, params, str(tmp_path / "art"), batch_size=4)
    assert meta["model"] == "DisentangledConditionalVAE"
    art = load_exported(str(tmp_path / "art"))

    rs = np.random.RandomState(3)
    x = rs.randint(0, 255, (4, 16, 16, 3), np.uint8)
    midx = np.array([0, 1, 2, 3], np.int32)
    got = art["reconstruct"](x, midx)
    want = eng.reconstruct(x, modality=midx)
    np.testing.assert_allclose(got, want, atol=1e-5)

    r, r2, zdim = meta["latent_shape"]
    noise = rs.randn(4, r, r2, zdim).astype(np.float32)
    s = art["sample"](noise, midx)
    assert s.shape == (4, 16, 16, 3)


def test_mesh_sharded_engine_matches_single_device():
    """mesh= shards request batches over the data axis (weights replicated);
    results must match the unsharded engine exactly and buckets round up to
    per-device-even sizes."""
    from medvae_tpu.core.mesh import create_mesh

    model = DisentangledConditionalVAE(
        num_modalities=5, shared_latent_dim=4, modality_latent_dim=4,
        hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), resolution=16,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1,), jnp.int32),
    )
    mesh = create_mesh()  # 8-device virtual CPU mesh (conftest)
    n_data = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                          if a in ("data", "dcn")]))
    single = InferenceEngine(model, variables["params"], buckets=(4, 16))
    sharded = InferenceEngine(
        model, variables["params"], buckets=(4, 16), mesh=mesh
    )
    assert all(b % n_data == 0 for b in sharded.buckets)

    rs = np.random.RandomState(5)
    x = rs.randint(0, 255, (10, 16, 16, 3), np.uint8)
    midx = (np.arange(10) % 5).astype(np.int32)
    np.testing.assert_allclose(
        sharded.reconstruct(x, modality=midx),
        single.reconstruct(x, modality=midx),
        atol=1e-5,
    )
    m_s, lv_s = sharded.encode(x, modality=midx)
    m_1, lv_1 = single.encode(x, modality=midx)
    np.testing.assert_allclose(m_s, m_1, atol=1e-5)
    np.testing.assert_allclose(lv_s, lv_1, atol=1e-5)


def test_from_checkpoint_use_ema_requires_ema(tmp_path):
    """use_ema must serve state.ema_params and fail loudly when absent."""
    import yaml

    from medvae_tpu.train.state import create_train_state
    from medvae_tpu.train.optim import build_optimizer
    import orbax.checkpoint as ocp

    model = BaseVAE(input_channels=3, **TINY)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 16, 3)),
    )
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, {"type": "constant"})
    state = create_train_state(variables["params"], tx, ema_decay=0.999)
    # make EMA distinguishable from the live params
    state = state.replace(
        ema_params=jax.tree_util.tree_map(lambda p: p * 0.0, state.ema_params)
    )
    ckpt = tmp_path / "ck" / "last"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), jax.device_get(state))
    ckptr.wait_until_finished()
    cfg = {
        "model": {"_target_": "src.models.BaseVAE", "input_channels": 3, **{
            k: (list(v) if isinstance(v, tuple) else v) for k, v in TINY.items()
        }},
        "precision": "fp32",
        "use_pallas": False,
    }
    with open(tmp_path / "ck" / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)

    eng = InferenceEngine.from_checkpoint(str(ckpt), buckets=(2,), use_ema=True)
    # zeroed EMA weights -> decode of zero latents is exactly the zero graph
    leaves = jax.tree_util.tree_leaves(eng.params)
    assert all(float(np.abs(np.asarray(l)).max()) == 0.0 for l in leaves)

    state_no_ema = create_train_state(variables["params"], tx)
    ckpt2 = tmp_path / "ck2" / "last"
    ckptr.save(str(ckpt2), jax.device_get(state_no_ema))
    ckptr.wait_until_finished()
    with open(tmp_path / "ck2" / "config.yaml", "w") as f:
        yaml.safe_dump(cfg, f)
    with pytest.raises(ValueError, match="ema_params"):
        InferenceEngine.from_checkpoint(str(ckpt2), buckets=(2,), use_ema=True)


def test_http_server_end_to_end():
    from medvae_tpu.cli.serve import _np_to_b64, _b64_to_np, serve

    _, _, eng = _dis_engine(buckets=(2, 4))
    httpd = serve(eng, host="127.0.0.1", port=0, warmup=False)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["status"] == "ok"
        with urllib.request.urlopen(f"{base}/info", timeout=30) as r:
            info = json.load(r)
        assert info["model"] == "DisentangledConditionalVAE"

        rs = np.random.RandomState(4)
        imgs = rs.randint(0, 255, (3, 16, 16, 3), np.uint8)
        payload = json.dumps(
            {"images_b64": _np_to_b64(imgs), "modality": [0, 1, 2]}
        ).encode()
        req = urllib.request.Request(
            f"{base}/reconstruct", payload,
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _b64_to_np(json.load(r)["images_b64"])
        want = eng.reconstruct(imgs, modality=np.array([0, 1, 2], np.int32))
        np.testing.assert_allclose(out, want, atol=1e-5)

        req = urllib.request.Request(
            f"{base}/sample",
            json.dumps({"num_samples": 2, "modality": 1, "seed": 5}).encode(),
            {"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = _b64_to_np(json.load(r)["images_b64"])
        assert out.shape == (2, 16, 16, 3)

        # malformed request -> 400 with an error body, server stays up
        req = urllib.request.Request(
            f"{base}/reconstruct", b"{}", {"Content-Type": "application/json"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_bench_serve_script_tiny(tmp_path):
    """scripts/bench_serve.py --tiny: the serving perf harness runs end to
    end (warmup, every method/bucket cell, latency percentiles, the
    MicroBatcher load section) and writes a well-formed results.json —
    the regression guard for the committed logs/serve_bench artifact."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "bench_serve.py"),
         "--tiny", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads((tmp_path / "results.json").read_text())
    (surface,) = res["surfaces"]
    methods = {c["method"] for c in surface["cells"]}
    assert methods == {"reconstruct", "encode", "decode", "sample"}
    assert {c["bucket"] for c in surface["cells"]} == {1, 4}
    assert all(c["images_per_sec"] > 0 for c in surface["cells"])
    assert surface["single_image_latency_ms"]["p99"] >= (
        surface["single_image_latency_ms"]["p50"]
    )
    mb = surface["microbatcher"]
    assert mb["requests"] == mb["clients"] * 3
    assert mb["achieved_req_per_sec"] > 0
