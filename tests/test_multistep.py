"""Fused multi-step execution (train/multistep.py): K optimizer steps per
dispatch via lax.scan with in-graph batch assembly must be numerically
identical to the per-step dispatch loop, and chunk planning must cut exactly
at every host-action cadence."""

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate
from medvae_tpu.data.medmnist import MedMNISTDataModule
from medvae_tpu.data.pipeline import DeviceCachedFeeder
from medvae_tpu.models import BaseVAE
from medvae_tpu.train.multistep import build_chunk_runner, chunk_plan
from medvae_tpu.train.optim import build_optimizer
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_train_step
import pytest

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow


TINY = dict(
    latent_dim=4, hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
    attn_resolutions=(), dropout=0.0, resolution=28,
)


def test_chunk_plan_cuts_at_every_cadence():
    # 12 steps, log every 5, ckpt every 4 -> cuts at 4,5,8,10,12
    assert chunk_plan(12, 0, 5, 4) == (
        (0, 4), (4, 1), (5, 3), (8, 2), (10, 2),
    )
    # zero/negative cadences are ignored; no cadence = one chunk
    assert chunk_plan(7, 0, 0, -3) == ((0, 7),)
    # start offset (resume skip) begins mid-plan
    assert chunk_plan(10, 3, 5) == ((3, 2), (5, 5))
    # global coordinates: cuts at global multiples
    assert chunk_plan(26, 16, 10) == ((16, 4), (20, 6))
    # absolute extra cuts (mid-epoch validation points)
    assert chunk_plan(26, 16, 10, extra=(23,)) == ((16, 4), (20, 3), (23, 3))
    # a chunk cap is just another cadence: multiple-of-K cuts bound every
    # chunk at <= K steps (training.fused_chunk_max — worker-crash guard for
    # very large per-dispatch programs at high resolution)
    plan = chunk_plan(100, 0, 100, 0, 16)
    assert plan == ((0, 16), (16, 16), (32, 16), (48, 16), (64, 16),
                    (80, 16), (96, 4))
    assert max(n for _, n in plan) <= 16


def _setup(bs=32, optimizer=None):
    dm = MedMNISTDataModule(["chestmnist"], batch_size=bs, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    feeder = DeviceCachedFeeder(dm.train_arrays, bs, mesh, shuffle=True,
                                drop_last=True, seed=7)
    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer(
        optimizer or {"type": "adam", "lr": 1e-3}, None
    )
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((2, 28, 28, 1)))
    kwargs = dict(
        model=model, loss_cfg={"type": "vae"}, tx=tx, mesh=mesh,
        augment=False, normalize=True, max_channels=1,
    )
    state = replicate(mesh, create_train_state(variables["params"], tx))
    return mesh, feeder, kwargs, state


def test_fused_chunks_match_per_step_loop():
    """Two chunks covering 6 steps must equal six dispatched steps.

    Under SGD the update is linear in the gradient, so any formulation error
    (wrong batch index, wrong rng fold, wrong step order) shows at the ~lr
    scale (1e-3) while XLA's scan-vs-standalone reassociation noise stays at
    ~lr x 1e-6 — the 1e-6 tolerance separates the two by three orders of
    magnitude. (Adam would amplify reassociation noise on near-zero gradient
    components via its normalizer, which is why the exactness test uses SGD;
    the trainer-level test covers the default path end to end.)"""
    mesh, feeder, kwargs, state = _setup(
        optimizer={"type": "sgd", "lr": 1e-3, "momentum": 0.0}
    )
    rng = jax.random.PRNGKey(3)

    step = build_train_step(**kwargs, donate=False)
    s_ref = state
    for i, batch in enumerate(feeder.epoch(0)):
        if i >= 6:
            break
        s_ref, m_ref = step(s_ref, batch, rng)

    raw = build_train_step(**kwargs, raw=True)
    runner = build_chunk_runner(raw, feeder, donate=False)
    s_fused = state
    s_fused, _ = runner(s_fused, 0, 0, 4, rng)
    s_fused, m_fused = runner(s_fused, 0, 4, 2, rng)

    assert int(jax.device_get(s_fused.step)) == int(jax.device_get(s_ref.step))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(b), atol=1e-6
        ),
        s_fused.params,
        s_ref.params,
    )
    np.testing.assert_allclose(
        float(jax.device_get(m_fused["train/loss"])),
        float(jax.device_get(m_ref["train/loss"])),
        atol=1e-5,
    )


def test_fused_gan_chunks_match_per_step_loop():
    """The dual-optimizer GAN step must fuse identically: generator and
    discriminator params, BatchNorm stats, and the step gate all thread
    through the scan carry. SGD keeps the comparison exact."""
    from medvae_tpu.nn.discriminator import NLayerDiscriminator
    from medvae_tpu.train.step import make_gan_loss

    dm = MedMNISTDataModule(["pathmnist"], batch_size=16, size=28,
                            root="/nonexistent")
    dm.setup(None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    feeder = DeviceCachedFeeder(dm.train_arrays, 16, mesh, shuffle=True,
                                drop_last=True, seed=5)
    model = BaseVAE(input_channels=3, **TINY)
    tx = build_optimizer({"type": "sgd", "lr": 1e-3, "momentum": 0.0}, None)
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros((2, 28, 28, 3)),
                          train=False)
    loss_cfg = {"type": "lpips_discriminator", "discriminator_factor": 0.5,
                "perceptual_factor": 1.0, "kl_factor": 1e-4,
                "discriminator_iter_start": 2}  # gate flips mid-chunk
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 28)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 28, 28, 3)))
    state = replicate(mesh, create_train_state(
        variables["params"], tx, frozen=frozen,
        disc_variables=disc_vars, disc_tx=tx,
    ))
    kwargs = dict(
        model=model, loss_cfg=loss_cfg, tx=tx, mesh=mesh,
        augment=False, normalize=True, max_channels=3,
        disc=disc, disc_tx=tx,
    )
    rng = jax.random.PRNGKey(9)

    step = build_train_step(**kwargs, donate=False)
    s_ref = state
    for i, batch in enumerate(feeder.epoch(0)):
        if i >= 4:
            break
        s_ref, _ = step(s_ref, batch, rng)

    raw = build_train_step(**kwargs, raw=True)
    runner = build_chunk_runner(raw, feeder, donate=False)
    s_fused, _ = runner(state, 0, 0, 4, rng)

    for tree_name in ("params", "disc_params", "disc_batch_stats"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                jax.device_get(a), jax.device_get(b), atol=1e-6
            ),
            getattr(s_fused, tree_name),
            getattr(s_ref, tree_name),
        )


def test_fused_validate_matches_per_batch(tmp_path, config_dir):
    """Whole-split scanned evaluation must reproduce the per-batch loop's
    metrics (weighted means, per-modality PSNR, tail masking) to float
    tolerance."""
    from medvae_tpu.config import compose
    from medvae_tpu.train.trainer import Trainer

    cfg = compose(
        config_dir,
        overrides=[
            "experiment=multi_modal_cvae_quick",
            f"work_dir={tmp_path}",
            "device=cpu",
            "training.max_epochs=1",
            "early_stopping.enabled=false",
            "data.batch_size=96",  # 5x256=1280 val samples -> ragged tail
            "model.hidden_channels=8",
            "model.ch_mult=[1,2]",
            "model.latent_dim=4",
            # force fusion: this run is below the auto amortization threshold
            "+training.fused_steps=on",
        ],
    )
    t = Trainer(cfg)
    fused = t.validate()
    assert t._eval_runners.get("val") is not None  # fused path engaged
    # capped sub-scans (the high-resolution worker-crash guard) must
    # reproduce the single whole-split scan exactly: start-offset chunks
    # concatenate to the identical per-batch metric stream
    t.cfg["training"]["fused_chunk_max"] = 3
    capped = t.validate()
    t.cfg["training"].pop("fused_chunk_max")
    t._eval_runners["val"] = None  # force the per-batch loop
    loop = t.validate()
    assert set(fused) == set(loop) == set(capped)
    for k in fused:
        np.testing.assert_allclose(fused[k], capped[k], rtol=1e-6,
                                   err_msg=f"capped {k}")
        np.testing.assert_allclose(fused[k], loop[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_trainer_fused_matches_unfused(tmp_path, config_dir):
    """End to end: a fused Trainer run equals a training.fused_steps=off run
    parameter-for-parameter (same seeds, same device-cached data). SGD keeps
    the comparison exact (see test_fused_chunks_match_per_step_loop)."""
    from medvae_tpu.config import compose
    from medvae_tpu.train.trainer import Trainer

    trainers = {}

    def run(sub, extra):
        cfg = compose(
            config_dir,
            overrides=[
                "experiment=chest_base_vae_quick",
                f"work_dir={tmp_path / sub}",
                "device=cpu",
                "training.max_epochs=1",
                "training.log_every_n_steps=4",
                "+training.log_images_every_n_epochs=0",
                "training.optimizer.type=sgd",
                "+training.optimizer.momentum=0.0",
                # bf16 compute would put scan-vs-standalone reassociation
                # noise at ~1e-4 (bf16 ulp), swamping the exactness check
                "precision=fp32",
                "early_stopping.enabled=false",
                "data.batch_size=128",
                "model.hidden_channels=8",
                "model.ch_mult=[1,2]",
                "model.latent_dim=4",
                *extra,
            ],
        )
        t = Trainer(cfg)
        t.fit()
        trainers[sub] = t
        return jax.device_get(t.state.params), int(jax.device_get(t.state.step))

    # the quick training config sets val_check_interval=0.5, so this also
    # covers mid-epoch validation inside the fused loop (an extra chunk cut);
    # fused_chunk_max=2 exercises the capped-chunk plan (the high-resolution
    # worker-crash guard) on the exactness contract
    p_fused, n_fused = run(
        "fused", ["+training.fused_steps=on", "+training.fused_chunk_max=2"]
    )
    p_plain, n_plain = run("plain", ["+training.fused_steps=off"])
    assert trainers["fused"]._fused_active and not trainers["plain"]._fused_active
    assert n_fused == n_plain
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-6),
        p_fused,
        p_plain,
    )
