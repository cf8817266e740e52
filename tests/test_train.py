"""Train-step tests: loss decreases, jit vs shard_map equivalence on the
8-device CPU mesh, GAN dual-optimizer step, optimizer/schedule builders,
metrics, checkpointing, early stopping."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from medvae_tpu.core.mesh import MeshSpec, create_mesh, replicate, shard_batch
from medvae_tpu.models import BaseVAE, DisentangledConditionalVAE
from medvae_tpu.nn.discriminator import NLayerDiscriminator
from medvae_tpu.parallel import build_shard_map_train_step
from medvae_tpu.train.metrics import psnr, reconstruction_metrics, ssim
from medvae_tpu.train.optim import build_optimizer, build_schedule
from medvae_tpu.train.state import create_train_state
from medvae_tpu.train.step import build_eval_step, build_train_step, make_gan_loss
from medvae_tpu.utils.training_utils import EarlyStopping

TINY = dict(
    latent_dim=8,
    hidden_channels=8,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=(),
    dropout=0.0,
    resolution=8,
)


def _batch(n=16, size=8, c=1, n_mod=5, seed=0):
    rs = np.random.RandomState(seed)
    midx = (np.arange(n) % n_mod).astype(np.int32)
    return {
        "image_u8": rs.randint(0, 255, (n, size, size, c), np.uint8),
        "label": np.zeros((n,), np.int32),
        "modality_onehot": np.eye(12, dtype=np.float32)[midx],
        "modality_idx": midx,
        "channels": np.asarray([1, 3, 3, 1, 3], np.int32)[midx][:n]
        if c == 3
        else np.ones((n,), np.int32),
        "valid": np.ones((n,), np.float32),
    }


def _init_state(model, x_shape, tx, midx=None):
    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "sample": rng}
    x = jnp.zeros(x_shape)
    if midx is not None:
        variables = model.init(rngs, x, midx)
    else:
        variables = model.init(rngs, x)
    return create_train_state(variables["params"], tx)


def test_train_step_decreases_loss():
    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer({"type": "adam", "lr": 3e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    state = replicate(mesh, _init_state(model, (2, 8, 8, 1), tx))
    step = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=1
    )
    batch = shard_batch(mesh, _batch(c=1))
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        state, m = step(state, batch, rng)
        losses.append(float(m["train/loss"]))
    assert losses[-1] < losses[0] * 0.8
    assert int(state.step) == 30


@pytest.mark.slow
def test_jit_and_shard_map_steps_agree():
    """The XLA-auto-collective step and the explicit shard_map step must
    produce the same params after one update (8-device mesh, global-batch
    semantics for the disentangled batch-coupled losses)."""
    n_dev = min(8, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs multi-device CPU mesh")
    model = DisentangledConditionalVAE(
        num_modalities=5, shared_latent_dim=4, modality_latent_dim=4,
        hidden_channels=8, ch_mult=(1, 2), num_res_blocks=1,
        attn_resolutions=(), resolution=8,
    )
    # SGD, not Adam: Adam's first step is lr*sign(grad), which amplifies
    # reduction-order noise in near-zero grads into +-lr flips; with SGD,
    # params-allclose <=> grads-allclose, which is the property under test.
    tx = build_optimizer({"type": "sgd", "lr": 1e-2, "momentum": 0.0}, None)
    mesh = create_mesh(MeshSpec(data=n_dev, model=1), jax.devices()[:n_dev])
    midx0 = jnp.zeros((2,), jnp.int32)
    state0 = _init_state(model, (2, 8, 8, 3), tx, midx0)
    loss_cfg = {"type": "disentangled_vae"}

    batch_host = _batch(n=2 * n_dev, c=3)
    rng = jax.random.PRNGKey(3)

    jit_step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3, donate=False
    )
    sm_step = build_shard_map_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3, donate=False
    )

    # identical per-sample reparameterization noise on both paths: eps rides
    # the batch (sharded over the data axis with it), so the two formulations
    # compute the SAME function — any disagreement is a collective/sharding bug
    rs = np.random.RandomState(7)
    enc_res = model.encoder_out_res
    zdim = model.shared_latent_dim + model.modality_latent_dim
    batch_host["noise"] = rs.randn(
        batch_host["image_u8"].shape[0], enc_res, enc_res, zdim
    ).astype(np.float32)

    s_jit = replicate(mesh, state0)
    s_sm = replicate(mesh, state0)
    batch = shard_batch(mesh, batch_host)

    s_jit, m_jit = jit_step(s_jit, batch, rng)
    s_sm, m_sm = sm_step(s_sm, batch, rng)

    l_jit = float(m_jit["train/loss"])
    l_sm = float(m_sm["train/loss"])
    assert np.isfinite(l_jit) and np.isfinite(l_sm)
    np.testing.assert_allclose(l_jit, l_sm, rtol=1e-5, atol=1e-6)
    # the *updated parameters* must agree elementwise — this is the real
    # multi-chip-correctness contract (incl. the all_gather'ed batch-global
    # separation/contrastive losses)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_jit.params),
        jax.tree_util.tree_leaves(s_sm.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # and both must have actually moved
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(s_jit.params),
            jax.tree_util.tree_leaves(state0.params),
        )
    )
    assert moved > 1e-5


@pytest.mark.slow
def test_gan_train_step_runs_and_gates():
    # NB: the PatchGAN's stride chain needs ≥16 px inputs to emit a non-empty
    # logit map (4×4 s2 ×2 then two 4×4 s1 VALID-ish convs).
    model = BaseVAE(input_channels=3, **{**TINY, "resolution": 16})
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)),
                          train=False)
    loss_cfg = {
        "type": "lpips_discriminator",
        "discriminator_factor": 0.5,
        "perceptual_factor": 1.0,
        "kl_factor": 1e-4,
        "discriminator_iter_start": 2,
    }
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 16)

    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)))
    state = create_train_state(
        variables["params"], tx, frozen=frozen,
        disc_variables=disc_vars, disc_tx=tx,
    )
    state = replicate(mesh, state)
    step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3,
        disc=disc, disc_tx=tx,
    )
    batch = shard_batch(mesh, _batch(n=8, size=16, c=3))
    rng = jax.random.PRNGKey(5)

    # before the gate the adversarial terms must be zero
    state, m0 = step(state, batch, rng)
    assert float(m0["train/d_weight"]) == 0.0
    assert float(m0["train/d_loss"]) == 0.0
    assert float(m0["train/g_loss"]) == 0.0
    # after the gate the discriminator trains and d_weight activates
    state, m1 = step(state, batch, rng)
    state, m2 = step(state, batch, rng)
    assert float(m2["train/d_loss"]) > 0.0
    assert float(m2["train/d_weight"]) >= 0.0
    assert np.isfinite(float(m2["train/total_loss"]))
    assert int(state.step) == 3


def test_gan_pixel_factor_adds_l1_term():
    """pixel_factor (Taming-style rec_loss = |x−x̂| + w·LPIPS; opt-in, 0 =
    exact reference parity with vae_losses.py:320-325's perceptual-only
    objective) must shift the generator loss by exactly pixel_factor·L1 and
    join the adaptive-weight numerator."""
    from medvae_tpu.losses.gan import LPIPSWithDiscriminator

    base = LPIPSWithDiscriminator(discriminator_iter_start=0)
    pix = LPIPSWithDiscriminator(discriminator_iter_start=0, pixel_factor=0.7)
    frozen = base.init_frozen(jax.random.PRNGKey(0), 16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.uniform(k1, (4, 16, 16, 3))
    rec = jax.random.uniform(k2, (4, 16, 16, 3))
    kl = jnp.ones((4,))
    logits = jnp.zeros((4, 1, 1, 1))
    w = jnp.asarray(0.0)
    step = jnp.asarray(5)

    l0, log0 = base.generator_loss(frozen, x, rec, kl, logits, w, step)
    l1, log1 = pix.generator_loss(frozen, x, rec, kl, logits, w, step)
    expect = 0.7 * float(jnp.mean(jnp.abs(x - rec)))
    np.testing.assert_allclose(float(l1 - l0), expect, rtol=1e-5)
    assert "train/pix_loss" not in log0
    np.testing.assert_allclose(
        float(log1["train/pix_loss"]), expect / 0.7, rtol=1e-5
    )
    # adaptive numerator gains the same term
    ra = float(pix.rec_for_adaptive(frozen, x, rec))
    rb = float(base.rec_for_adaptive(frozen, x, rec))
    np.testing.assert_allclose(ra - rb, expect, rtol=1e-5)


@pytest.mark.slow
def test_gan_step_updates_ema_and_honors_lr_scale():
    """Regression: the GAN step must maintain ema_params (else --use_ema
    serves init-era weights for GAN runs) and apply state.lr_scale to BOTH
    optimizers (else ReduceLROnPlateau is a silent no-op under GAN)."""
    model = BaseVAE(input_channels=3, **{**TINY, "resolution": 16})
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)),
                          train=False)
    loss_cfg = {"type": "lpips_discriminator", "discriminator_factor": 0.5,
                "perceptual_factor": 1.0, "kl_factor": 1e-4,
                "discriminator_iter_start": 0}
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)))

    def fresh_state():
        return replicate(mesh, create_train_state(
            variables["params"], tx, frozen=frozen,
            disc_variables=disc_vars, disc_tx=tx, ema_decay=0.5,
        ))

    step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3,
        disc=disc, disc_tx=tx, ema_decay=0.5, donate=False,
    )
    batch = shard_batch(mesh, _batch(n=8, size=16, c=3))
    rng = jax.random.PRNGKey(5)

    s0 = fresh_state()
    s1, _ = step(s0, batch, rng)
    # EMA moved towards the new params (decay 0.5 -> halfway)
    p0 = jax.device_get(s0.params["encoder"]["conv_in"]["kernel"])
    p1 = jax.device_get(s1.params["encoder"]["conv_in"]["kernel"])
    e1 = jax.device_get(s1.ema_params["encoder"]["conv_in"]["kernel"])
    assert not np.allclose(e1, p0)  # no longer frozen at init
    np.testing.assert_allclose(e1, 0.5 * p0 + 0.5 * p1, atol=1e-6)

    # lr_scale=0 must freeze BOTH generator and discriminator
    s_frozen = fresh_state().replace(lr_scale=jnp.asarray(0.0, jnp.float32))
    s2, _ = step(s_frozen, batch, rng)
    np.testing.assert_array_equal(
        jax.device_get(s2.params["encoder"]["conv_in"]["kernel"]), p0
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            jax.device_get(a), jax.device_get(b)
        ),
        s2.disc_params,
        s_frozen.disc_params,
    )


def test_eval_step_masks_invalid():
    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    state = replicate(mesh, _init_state(model, (2, 8, 8, 1), tx))
    ev = build_eval_step(model, {"type": "vae"}, mesh, max_channels=1)
    b = _batch(n=8, c=1)
    b["valid"] = np.array([1, 1, 1, 1, 0, 0, 0, 0], np.float32)
    # poison invalid rows: metrics must not change
    b2 = {k: v.copy() for k, v in b.items()}
    b2["image_u8"][4:] = 255
    m1 = ev(state, shard_batch(mesh, b), jax.random.PRNGKey(0))
    m2 = ev(state, shard_batch(mesh, b2), jax.random.PRNGKey(0))
    assert abs(float(m1["val/psnr"]) - float(m2["val/psnr"])) < 1e-4
    assert float(m1["val/_weight"]) == 4.0


def test_psnr_ssim_sanity():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 16, 16, 1) * 2 - 1, jnp.float32)
    assert float(psnr(x, x).mean()) > 80
    assert abs(float(ssim(x, x).mean()) - 1.0) < 1e-5
    noisy = x + 0.1 * jnp.asarray(rs.randn(2, 16, 16, 1), jnp.float32)
    m = reconstruction_metrics(noisy, x)
    assert 15 < float(m["psnr"]) < 35
    assert 0 < float(m["ssim"]) < 1


def test_schedules():
    cosine = build_schedule({"type": "cosine", "T_max": 10, "eta_min": 1e-6},
                            1e-3, steps_per_epoch=1)
    assert abs(float(cosine(0)) - 1e-3) < 1e-9
    assert float(cosine(10)) <= 1.1e-6
    step_s = build_schedule({"type": "step", "step_size": 5, "gamma": 0.5},
                            1e-3, steps_per_epoch=1)
    assert abs(float(step_s(4)) - 1e-3) < 1e-9
    assert abs(float(step_s(5)) - 5e-4) < 1e-9
    exp = build_schedule({"type": "exponential", "gamma": 0.9}, 1.0,
                         steps_per_epoch=2)
    assert abs(float(exp(4)) - 0.81) < 1e-6


def test_early_stopping():
    es = EarlyStopping(patience=2, monitor="val/loss")
    assert not es.update({"val/loss": 1.0})
    assert not es.update({"val/loss": 0.5})
    assert not es.update({"val/loss": 0.6})
    assert es.update({"val/loss": 0.7})
    assert es.should_stop


def test_checkpoint_roundtrip(tmp_path):
    from medvae_tpu.train.checkpoint import CheckpointManager

    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    state = _init_state(model, (2, 8, 8, 1), tx)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_top_k=2)
    mgr.save_step(state, {"val/loss": 1.0})
    mgr.save_step(state.replace(step=state.step + 1), {"val/loss": 0.5})
    mgr.save_step(state.replace(step=state.step + 2), {"val/loss": 2.0})
    mgr.wait()
    assert mgr.best_path() is not None and "step_" in mgr.best_path()
    assert len(mgr._best) == 2  # top-k eviction
    restored = mgr.restore(state, "last")
    assert int(restored.step) == int(state.step) + 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.params)[0]),
    )


def test_ema_tracking():
    """training.ema_decay maintains a lagged copy of params in the state."""
    model = BaseVAE(input_channels=1, **TINY)
    tx = build_optimizer({"type": "adam", "lr": 1e-2}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 8, 8, 1)))
    state = replicate(
        mesh, create_train_state(variables["params"], tx, ema_decay=0.9)
    )
    assert state.ema_params is not None
    step = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=1,
        ema_decay=0.9, donate=False,
    )
    batch = shard_batch(mesh, _batch(n=8, c=1))
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    d_param = float(jnp.max(jnp.abs(p - p0)))
    d_ema = float(jnp.max(jnp.abs(e - p0)))
    assert d_param > 0 and d_ema > 0
    assert d_ema < d_param  # EMA lags the raw params


@pytest.mark.slow
def test_gradient_accumulation_matches_full_batch():
    """k microbatches with grad averaging must produce the SAME updated params
    as the full-batch step when the per-sample noise is pinned in-batch (the
    VAE loss is a per-sample mean, so microbatch-averaged grads are exactly the
    full-batch grads)."""
    model = BaseVAE(input_channels=1, **TINY)  # dropout=0 in TINY
    # SGD so that params-allclose <=> grads-allclose (see shard_map test)
    tx = build_optimizer({"type": "sgd", "lr": 1e-2, "momentum": 0.0}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    state0 = _init_state(model, (2, 8, 8, 1), tx)
    batch_host = _batch(n=8, c=1)
    rs = np.random.RandomState(11)
    enc_res = model.encoder_out_res
    batch_host["noise"] = rs.randn(8, enc_res, enc_res, model.latent_dim).astype(
        np.float32
    )
    batch = shard_batch(mesh, batch_host)
    rng = jax.random.PRNGKey(9)

    step_full = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=1,
        donate=False,
    )
    step_acc = build_train_step(
        model, {"type": "vae"}, tx, mesh, augment=False, max_channels=1,
        donate=False, accumulate_grad_batches=4,
    )
    s_full, m_full = step_full(replicate(mesh, state0), batch, rng)
    s_acc, m_acc = step_acc(replicate(mesh, state0), batch, rng)
    np.testing.assert_allclose(
        float(m_full["train/loss"]), float(m_acc["train/loss"]),
        rtol=1e-5, atol=1e-6,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_full.params),
        jax.tree_util.tree_leaves(s_acc.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(s_full.params),
            jax.tree_util.tree_leaves(state0.params),
        )
    )
    assert moved > 1e-5
    assert int(s_acc.step) == 1  # one optimizer update despite 4 microbatches


@pytest.mark.slow
def test_gan_jit_and_shard_map_steps_agree():
    """Dual-optimizer GAN step: jit/NamedSharding vs explicit shard_map with
    sync-BN + global adaptive weight must produce elementwise-equal generator
    AND discriminator params (pinned noise, SGD, gate open)."""
    n_dev = min(8, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs multi-device CPU mesh")
    from medvae_tpu.models import ConditionalVAE
    from medvae_tpu.parallel import build_shard_map_gan_step

    model = ConditionalVAE(
        input_channels=3, latent_dim=4, hidden_channels=8, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(), dropout=0.0, resolution=16,
        condition_method="concat",
    )
    tx = build_optimizer({"type": "sgd", "lr": 1e-2, "momentum": 0.0}, None)
    mesh = create_mesh(MeshSpec(data=n_dev, model=1), jax.devices()[:n_dev])
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), train=False
    )
    loss_cfg = {
        "type": "lpips_discriminator",
        "discriminator_factor": 0.5,
        "perceptual_factor": 1.0,
        "kl_factor": 1e-4,
        "discriminator_iter_start": 0,  # gate open from step 0
    }
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)), jnp.zeros((2, 12)))
    state0 = create_train_state(
        variables["params"], tx, frozen=frozen,
        disc_variables=disc_vars, disc_tx=tx,
    )

    batch_host = _batch(n=2 * n_dev, size=16, c=3)
    rs = np.random.RandomState(3)
    batch_host["noise"] = rs.randn(2 * n_dev, 8, 8, 4).astype(np.float32)
    batch = shard_batch(mesh, batch_host)
    rng = jax.random.PRNGKey(7)

    jit_step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3,
        disc=disc, disc_tx=tx, donate=False,
    )
    sm_step = build_shard_map_gan_step(
        model, loss_cfg, tx, mesh, disc, tx,
        augment=False, max_channels=3, donate=False,
    )
    s_jit, m_jit = jit_step(replicate(mesh, state0), batch, rng)
    s_sm, m_sm = sm_step(replicate(mesh, state0), batch, rng)

    np.testing.assert_allclose(
        float(m_jit["train/total_loss"]), float(m_sm["train/total_loss"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(m_jit["train/d_loss"]), float(m_sm["train/d_loss"]), rtol=1e-4
    )
    for name, tree_a, tree_b in [
        ("gen", s_jit.params, s_sm.params),
        ("disc", s_jit.disc_params, s_sm.disc_params),
        ("bn_stats", s_jit.disc_batch_stats, s_sm.disc_batch_stats),
    ]:
        for a, b in zip(
            jax.tree_util.tree_leaves(tree_a), jax.tree_util.tree_leaves(tree_b)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name
            )
    moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(s_jit.params),
            jax.tree_util.tree_leaves(state0.params),
        )
    )
    assert moved > 1e-6


@pytest.mark.slow
def test_gan_grad_accumulation_runs():
    """GAN + accumulate_grad_batches: k microbatches scanned, ONE update per
    optimizer, BatchNorm stats threaded sequentially. (Unlike the plain path
    this is not bitwise equal to full-batch: per-microbatch BN moments and
    adaptive weights are standard accumulation semantics.)"""
    model = BaseVAE(input_channels=3, **{**TINY, "resolution": 16})
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), train=False
    )
    loss_cfg = {
        "type": "lpips_discriminator",
        "discriminator_iter_start": 0,
        "kl_factor": 1e-4,
    }
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)))
    state0 = create_train_state(
        variables["params"], tx, frozen=frozen,
        disc_variables=disc_vars, disc_tx=tx,
    )
    step = build_train_step(
        model, loss_cfg, tx, mesh, augment=False, max_channels=3,
        disc=disc, disc_tx=tx, donate=False, accumulate_grad_batches=2,
    )
    batch = shard_batch(mesh, _batch(n=8, size=16, c=3))
    state, m = step(replicate(mesh, state0), batch, jax.random.PRNGKey(5))
    assert int(state.step) == 1  # one dual-optimizer update from 2 microbatches
    assert np.isfinite(float(m["train/total_loss"]))
    assert np.isfinite(float(m["train/d_loss"]))
    d_moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.disc_params),
            jax.tree_util.tree_leaves(state0.disc_params),
        )
    )
    g_moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state0.params),
        )
    )
    assert d_moved > 0 and g_moved > 0
    stats_moved = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.disc_batch_stats),
            jax.tree_util.tree_leaves(state0.disc_batch_stats),
        )
    )
    assert stats_moved > 0  # BN running stats updated through the scan


@pytest.mark.slow
def test_gan_eval_step_logs_gan_terms():
    """Validation under the GAN loss logs the generator objective (reference
    val semantics: d_weight=0) plus g/d losses, so monitors track a metric the
    run optimizes."""
    model = BaseVAE(input_channels=3, **{**TINY, "resolution": 16})
    tx = build_optimizer({"type": "adam", "lr": 1e-3}, None)
    mesh = create_mesh(MeshSpec(data=1, model=1), jax.devices()[:1])
    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=2)
    disc_vars = disc.init(
        jax.random.PRNGKey(1), jnp.zeros((2, 16, 16, 3)), train=False
    )
    loss_cfg = {"type": "lpips_discriminator", "discriminator_iter_start": 0,
                "kl_factor": 1e-4}
    gan_loss = make_gan_loss(loss_cfg)
    frozen = gan_loss.init_frozen(jax.random.PRNGKey(2), 16)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.zeros((2, 16, 16, 3)))
    state = replicate(mesh, create_train_state(
        variables["params"], tx, frozen=frozen,
        disc_variables=disc_vars, disc_tx=tx,
    ))
    ev = build_eval_step(model, loss_cfg, mesh, max_channels=3, disc=disc)
    m = ev(state, shard_batch(mesh, _batch(n=4, size=16, c=3)),
           jax.random.PRNGKey(3))
    for key in ("val/loss", "val/p_loss", "val/kl_loss", "val/g_loss",
                "val/d_loss", "val/d_weight", "val/psnr"):
        assert key in m, key
    assert float(m["val/d_weight"]) == 0.0  # reference val fallback
    assert np.isfinite(float(m["val/loss"]))
    assert float(m["val/p_loss"]) > 0.0
