"""Loss math tests: analytic KL vs formula, ELBO weighting, NaN-proofing,
GAN pieces (hinge, adaptive weight), perceptual loss shapes."""

import jax
import jax.numpy as jnp
import numpy as np

from medvae_tpu.losses import (
    DisentangledVAELoss,
    LPIPSLoss,
    SimpleCLIPEncoder,
    VAELoss,
    gaussian_kl,
    hinge_d_loss,
)
from medvae_tpu.losses.gan import adaptive_weight
from medvae_tpu.losses.perceptual import BiomedCLIPLoss


def test_gaussian_kl_analytic():
    # KL(N(0,1) || N(0,1)) = 0
    z = jnp.zeros((4, 8))
    np.testing.assert_allclose(np.asarray(gaussian_kl(z, z)), 0.0, atol=1e-7)
    # KL(N(1, 1) || N(0,1)) = 0.5 per dim
    kl = gaussian_kl(jnp.ones((2, 3)), jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(kl), 0.5, atol=1e-6)
    # matches the closed form for random mu/logvar
    rs = np.random.RandomState(0)
    mu = rs.randn(5, 7).astype(np.float32)
    logvar = rs.randn(5, 7).astype(np.float32)
    expected = -0.5 * (1 + logvar - mu**2 - np.exp(logvar))
    np.testing.assert_allclose(
        np.asarray(gaussian_kl(jnp.asarray(mu), jnp.asarray(logvar))),
        expected,
        rtol=1e-5,
    )


def test_vae_loss_weighting():
    outputs = {
        "reconstruction": jnp.ones((2, 4, 4, 1)) * 0.5,
        "mean": jnp.ones((2, 2, 2, 2)),
        "logvar": jnp.zeros((2, 2, 2, 2)),
    }
    targets = jnp.zeros((2, 4, 4, 1))
    d = VAELoss(recon_loss_type="mse", kl_weight=2.0, recon_weight=3.0)(
        outputs, targets
    )
    assert abs(float(d["recon_loss"]) - 0.25) < 1e-6
    assert abs(float(d["kl_loss"]) - 0.5) < 1e-6
    assert abs(float(d["loss"]) - (3 * 0.25 + 2 * 0.5)) < 1e-6
    # beta applies multiplicatively to KL
    d_beta = VAELoss(kl_weight=1.0, beta=4.0)(outputs, targets)
    assert abs(float(d_beta["loss"]) - (0.25 + 4 * 0.5)) < 1e-6


def test_vae_loss_l1_and_bce():
    outputs = {
        "reconstruction": jnp.full((2, 4, 4, 1), 0.5),
        "mean": jnp.zeros((2, 2)),
        "logvar": jnp.zeros((2, 2)),
    }
    targets = jnp.zeros((2, 4, 4, 1))
    l1 = VAELoss(recon_loss_type="l1")(outputs, targets)
    assert abs(float(l1["recon_loss"]) - 0.5) < 1e-6
    bce = VAELoss(recon_loss_type="bce")(outputs, targets)
    # bce_with_logits(0.5, 0) = 0.5 + log(1+e^-0.5) ≈ 0.974077
    assert abs(float(bce["recon_loss"]) - 0.974077) < 1e-4


def test_disentangled_loss_nan_proof():
    outputs = {
        "reconstruction": jnp.full((2, 4, 4, 3), jnp.nan),
        "mu": jnp.full((2, 8), jnp.inf),
        "logvar": jnp.zeros((2, 8)),
        "separation_loss": jnp.asarray(jnp.nan),
        "contrastive_loss": jnp.asarray(0.5),
    }
    targets = jnp.zeros((2, 4, 4, 3))
    d = DisentangledVAELoss()(outputs, targets)
    for k, v in d.items():
        assert np.isfinite(float(v)), k


def test_disentangled_loss_kl_normalization():
    # KL summed over elements / numel(targets)  (reference :524-525)
    outputs = {
        "reconstruction": jnp.zeros((2, 4, 4, 3)),
        "mu": jnp.ones((2, 8)),
        "logvar": jnp.zeros((2, 8)),
        "separation_loss": jnp.asarray(0.0),
        "contrastive_loss": jnp.asarray(0.0),
    }
    targets = jnp.zeros((2, 4, 4, 3))
    d = DisentangledVAELoss()(outputs, targets)
    expected = 0.5 * 16 / 96  # 0.5 per dim × 16 dims / 96 target elements
    assert abs(float(d["kl_loss"]) - expected) < 1e-6


def test_hinge_d_loss():
    real = jnp.asarray([2.0, 2.0])
    fake = jnp.asarray([-2.0, -2.0])
    assert float(hinge_d_loss(real, fake)) == 0.0  # perfectly separated
    assert float(hinge_d_loss(-real, -fake)) == 3.0  # maximally wrong


def test_adaptive_weight():
    nll = {"w": jnp.asarray([3.0, 4.0])}  # norm 5
    g = {"w": jnp.asarray([0.0, 1.0])}  # norm 1
    w = float(adaptive_weight(nll, g))
    assert abs(w - 5.0 / (1.0 + 1e-4)) < 1e-3
    # clamped at 1e4
    w2 = float(adaptive_weight(nll, {"w": jnp.zeros(2)}))
    assert w2 <= 1e4 + 1


def test_lpips_loss_runs_and_discriminates():
    lp = LPIPSLoss()
    params = lp.init(jax.random.PRNGKey(0), image_hw=32)
    rs = np.random.RandomState(0)
    a = jnp.asarray(rs.rand(2, 32, 32, 1), jnp.float32)
    same = float(lp(params, a, a))
    diff = float(lp(params, a, jnp.asarray(rs.rand(2, 32, 32, 1), jnp.float32)))
    assert same < 1e-6
    assert diff > same


def test_clip_feature_loss_runs():
    bc = BiomedCLIPLoss()
    params = bc.init(jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(2, 28, 28, 3) * 2 - 1, jnp.float32)
    rec = jnp.asarray(rs.rand(2, 28, 28, 3) * 2 - 1, jnp.float32)
    v_same = float(bc(params, img, rec=img))
    v_diff = float(bc(params, img, rec=rec))
    assert v_same < 1e-4
    assert v_diff > v_same


def test_simple_clip_encoder_shape():
    enc = SimpleCLIPEncoder()
    params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    out = enc.apply(params, jnp.zeros((3, 224, 224, 3)))
    assert out.shape == (3, 512)


def test_lpips_npz_weight_grafting(tmp_path):
    """load_npz grafts flat 'params/...' arrays into the LPIPS tree (the format
    scripts/export_torch_weights.py emits)."""
    import flax
    import numpy as np_

    lp = LPIPSLoss()
    params = lp.init(jax.random.PRNGKey(0), image_hw=64)
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    # write an npz overriding two leaves with known values
    k1 = "params/alex/conv1/kernel"
    k2 = "params/lin0"
    path = str(tmp_path / "w.npz")
    np_.savez(path, **{
        k1: np_.ones_like(np_.asarray(flat[k1])),
        k2: np_.full_like(np_.asarray(flat[k2]), 0.25),
    })
    grafted = LPIPSLoss.load_npz(params, path)
    gflat = flax.traverse_util.flatten_dict(grafted, sep="/")
    assert float(jnp.min(gflat[k1])) == 1.0
    assert float(jnp.max(jnp.abs(gflat[k2] - 0.25))) == 0.0
    # untouched leaves stay
    other = "params/alex/conv2/kernel"
    np_.testing.assert_array_equal(np_.asarray(gflat[other]),
                                   np_.asarray(flat[other]))


def test_clip_vit_npz_key_compat(tmp_path):
    """Every key scripts/export_torch_weights.py would emit for ViT-B/32 must
    exist in our CLIPViT param tree (format lock for the export tool)."""
    import flax

    from medvae_tpu.losses.clip_vit import CLIPViT

    vit = CLIPViT()
    params = vit.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    flat = flax.traverse_util.flatten_dict(params, sep="/")
    expected = [
        "params/patch_embed/kernel",
        "params/class_embedding",
        "params/positional_embedding",
        "params/ln_pre/scale",
        "params/ln_post/bias",
        "params/proj",
        "params/block_0/ln1/scale",
        "params/block_0/attn/qkv/kernel",
        "params/block_0/attn/proj/bias",
        "params/block_0/mlp_fc/kernel",
        "params/block_11/mlp_proj/bias",
    ]
    for k in expected:
        assert k in flat, k
