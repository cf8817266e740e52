"""Torch-oracle parity for the perceptual losses (LPIPS + BiomedCLIP fallback).

The reference's LPIPS loss wraps `lpips.LPIPS(net='alex')`
(/root/reference/src/losses/vae_losses.py:67-94) and its CLIP loss falls back
to SimpleCLIPEncoder (:189-211) when open_clip is absent. Neither package is
installed here, so the oracle re-creates their *exact eval-mode math* in torch
(the lpips graph: ScalingLayer -> torchvision-AlexNet relu taps ->
normalize_tensor -> squared diff -> 1x1 lin heads -> spatial mean -> layer sum;
and the fallback CNN verbatim), initializes it with random weights, transplants
those weights into the Flax modules, and requires agreement of BOTH the loss
value and its gradient w.r.t. the reconstruction (the quantity that actually
trains the VAE).

This pins the perceptual objectives to the reference's math independently of
pretrained weights; `scripts/export_torch_weights.py` grafts real weights when
available, landing on the same graph tested here.
"""

import numpy as np
import pytest

# end-to-end / compile-heavy: nightly tier (`pytest -m slow`); the fast
# tier is `pytest -m "not slow"` (README: Tests).
pytestmark = pytest.mark.slow

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

import jax  # noqa: E402
import flax  # noqa: E402
from torch import nn as tnn  # noqa: E402

from medvae_tpu.losses.perceptual import (  # noqa: E402

    BiomedCLIPLoss,
    LPIPSLoss,
    SimpleCLIPEncoder,
    _LPIPS_SHIFT,
    _LPIPS_SCALE,
)


# ---------------------------------------------------------------------------
# Torch oracle: lpips.LPIPS(net='alex') eval-mode forward, re-created from the
# published lpips math (ScalingLayer constants, torchvision alexnet.features
# slicing at the 5 relu taps, normalize_tensor eps placement OUTSIDE sqrt).
# ---------------------------------------------------------------------------


class _TorchAlexTaps(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 11, stride=4, padding=2)
        self.conv2 = tnn.Conv2d(64, 192, 5, padding=2)
        self.conv3 = tnn.Conv2d(192, 384, 3, padding=1)
        self.conv4 = tnn.Conv2d(384, 256, 3, padding=1)
        self.conv5 = tnn.Conv2d(256, 256, 3, padding=1)
        self.pool = tnn.MaxPool2d(3, 2)

    def forward(self, x):
        taps = []
        h = torch.relu(self.conv1(x))
        taps.append(h)
        h = torch.relu(self.conv2(self.pool(h)))
        taps.append(h)
        h = torch.relu(self.conv3(self.pool(h)))
        taps.append(h)
        h = torch.relu(self.conv4(h))
        taps.append(h)
        h = torch.relu(self.conv5(h))
        taps.append(h)
        return taps


class _TorchLPIPS(tnn.Module):
    """lpips.LPIPS(net='alex', eval) forward math with arbitrary weights."""

    def __init__(self):
        super().__init__()
        self.trunk = _TorchAlexTaps()
        chans = (64, 192, 384, 256, 256)
        # lpips lins are Conv2d(C,1,1,bias=False); pretrained weights are
        # non-negative (matching the Flax module's abs() guard).
        self.lins = tnn.ModuleList(
            [tnn.Conv2d(c, 1, 1, bias=False) for c in chans]
        )
        self.register_buffer("shift", torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor(_LPIPS_SCALE).view(1, 3, 1, 1))

    @staticmethod
    def _normalize(x, eps=1e-10):
        return x / (torch.sqrt(torch.sum(x**2, dim=1, keepdim=True)) + eps)

    def forward(self, a, b):
        fa = self.trunk((a - self.shift) / self.scale)
        fb = self.trunk((b - self.shift) / self.scale)
        val = 0.0
        for tap_a, tap_b, lin in zip(fa, fb, self.lins):
            diff = (self._normalize(tap_a) - self._normalize(tap_b)) ** 2
            val = val + lin(diff).mean(dim=(2, 3))  # spatial average
        return val  # (N, 1)


def _transplant_lpips(tmodel: _TorchLPIPS, jparams):
    flat = dict(flax.traverse_util.flatten_dict(jparams, sep="/"))
    sd = tmodel.state_dict()
    for i in range(1, 6):
        w = sd[f"trunk.conv{i}.weight"].numpy().transpose(2, 3, 1, 0)
        flat[f"params/alex/conv{i}/kernel"] = jnp.asarray(w)
        flat[f"params/alex/conv{i}/bias"] = jnp.asarray(
            sd[f"trunk.conv{i}.bias"].numpy()
        )
    for i in range(5):
        flat[f"params/lin{i}"] = jnp.asarray(
            sd[f"lins.{i}.weight"].numpy().reshape(-1)
        )
    return flax.traverse_util.unflatten_dict(flat, sep="/")


@pytest.fixture(scope="module")
def lpips_pair():
    torch.manual_seed(0)
    tmodel = _TorchLPIPS().eval()
    # non-negative lin weights (as in the pretrained lpips checkpoints)
    with torch.no_grad():
        for lin in tmodel.lins:
            lin.weight.uniform_(0.0, 2.0 / lin.weight.shape[1])
    jloss = LPIPSLoss()
    jparams = _transplant_lpips(tmodel, jloss.init(jax.random.PRNGKey(0)))
    return tmodel, jloss, jparams


def test_lpips_forward_parity(lpips_pair):
    tmodel, jloss, jparams = lpips_pair
    rs = np.random.RandomState(1)
    x = rs.rand(2, 1, 64, 64).astype(np.float32)  # grayscale, [0,1] space
    y = np.clip(x + 0.1 * rs.randn(*x.shape).astype(np.float32), 0, 1)

    # reference wrapper semantics: *2-1, gray->RGB repeat, batch mean
    tx = torch.from_numpy(x) * 2 - 1
    ty = torch.from_numpy(y) * 2 - 1
    with torch.no_grad():
        t_val = tmodel(tx.repeat(1, 3, 1, 1), ty.repeat(1, 3, 1, 1)).mean().item()

    j_val = float(
        jloss(jparams, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)))
    )
    assert abs(t_val - j_val) < 1e-5, (t_val, j_val)


def test_lpips_gradient_parity(lpips_pair):
    """d(loss)/d(reconstruction) is what trains the VAE — it must match."""
    tmodel, jloss, jparams = lpips_pair
    rs = np.random.RandomState(2)
    x = rs.rand(2, 1, 64, 64).astype(np.float32)
    y = np.clip(x + 0.05 * rs.randn(*x.shape).astype(np.float32), 0, 1)

    ty = torch.from_numpy(y).requires_grad_(True)
    tx = torch.from_numpy(x) * 2 - 1
    t_loss = tmodel(tx.repeat(1, 3, 1, 1), (ty * 2 - 1).repeat(1, 3, 1, 1)).mean()
    t_loss.backward()
    t_grad = ty.grad.numpy()

    j_grad = jax.grad(
        lambda r: jloss(jparams, jnp.asarray(x.transpose(0, 2, 3, 1)), r)
    )(jnp.asarray(y.transpose(0, 2, 3, 1)))
    j_grad = np.asarray(j_grad).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(t_grad, j_grad, atol=1e-6)


def test_lpips_small_inputs_upsample_instead_of_failing(lpips_pair):
    """Below the AlexNet stride floor (64px) the loss upsamples first. The
    torch original simply cannot run there (maxpool underflow) — this is a
    documented extension, asserted finite + positive."""
    _, jloss, jparams = lpips_pair
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, 28, 28, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(2, 28, 28, 1).astype(np.float32))
    v = float(jloss(jparams, x, y))
    assert np.isfinite(v) and v > 0


# ---------------------------------------------------------------------------
# Torch oracle: BiomedCLIPLoss with the SimpleCLIPEncoder fallback
# (/root/reference/src/losses/vae_losses.py:97-211) — the path the reference
# actually executes without open_clip installed.
# ---------------------------------------------------------------------------


class _TorchSimpleCLIP(tnn.Module):
    def __init__(self, embed_dim=512):
        super().__init__()
        self.encoder = tnn.Sequential(
            tnn.Conv2d(3, 64, 7, stride=2, padding=3),
            tnn.ReLU(),
            tnn.MaxPool2d(2),
            tnn.Conv2d(64, 128, 3, stride=2, padding=1),
            tnn.ReLU(),
            tnn.MaxPool2d(2),
            tnn.Conv2d(128, 256, 3, stride=2, padding=1),
            tnn.ReLU(),
            tnn.AdaptiveAvgPool2d((1, 1)),
            tnn.Flatten(),
            tnn.Linear(256, embed_dim),
            tnn.ReLU(),
            tnn.Linear(embed_dim, embed_dim),
        )

    def forward(self, x):
        return self.encoder(x)


_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _torch_clip_loss(tenc, img, rec=None, latent=None, lat_loss=False):
    """Reference BiomedCLIPLoss.forward semantics (vae_losses.py:135-179)."""

    def prep(z):
        z = torch.clamp((z + 1.0) / 2.0, 0.0, 1.0)
        if z.shape[1] == 1:
            z = z.expand(-1, 3, -1, -1)
        z = torch.nn.functional.interpolate(
            z, size=(224, 224), mode="bicubic", antialias=True
        )
        mean = torch.tensor(_CLIP_MEAN).view(1, 3, 1, 1)
        std = torch.tensor(_CLIP_STD).view(1, 3, 1, 1)
        return (z - mean) / std

    img_f = tenc(prep(img))
    total = torch.tensor(0.0)
    if rec is not None:
        rec_f = tenc(prep(rec))
        total = total + ((img_f - rec_f) ** 2).sum(1).mean()
    if lat_loss and latent is not None:
        # reference encodes the latent WITHOUT the CLIP transform
        # (vae_losses.py:168-177)
        lat = latent / 4.6
        lat = lat.mean(1, keepdim=True)
        lat = torch.nn.functional.interpolate(lat, size=(224, 224), mode="bilinear")
        lat = lat.expand(-1, 3, -1, -1)
        lat_f = tenc(lat)
        total = total + ((img_f - lat_f) ** 2).sum(1).mean()
    return total


def _transplant_simple_clip(tmodel: _TorchSimpleCLIP, jparams):
    flat = dict(flax.traverse_util.flatten_dict(jparams, sep="/"))
    sd = tmodel.state_dict()
    conv_keys = ["encoder.0", "encoder.3", "encoder.6"]
    for i, tk in enumerate(conv_keys):
        flat[f"params/Conv_{i}/kernel"] = jnp.asarray(
            sd[f"{tk}.weight"].numpy().transpose(2, 3, 1, 0)
        )
        flat[f"params/Conv_{i}/bias"] = jnp.asarray(sd[f"{tk}.bias"].numpy())
    for i, tk in enumerate(["encoder.10", "encoder.12"]):
        flat[f"params/Dense_{i}/kernel"] = jnp.asarray(
            sd[f"{tk}.weight"].numpy().T
        )
        flat[f"params/Dense_{i}/bias"] = jnp.asarray(sd[f"{tk}.bias"].numpy())
    return flax.traverse_util.unflatten_dict(flat, sep="/")


@pytest.fixture(scope="module")
def clip_pair():
    torch.manual_seed(1)
    tenc = _TorchSimpleCLIP().eval()
    jloss = BiomedCLIPLoss(encoder="simple")
    jparams = _transplant_simple_clip(tenc, jloss.init(jax.random.PRNGKey(1)))
    return tenc, jloss, jparams


def test_simple_clip_encoder_parity(clip_pair):
    """Encoder graph alone, on pre-sized 224 inputs (isolates conv math)."""
    tenc, jloss, jparams = clip_pair
    rs = np.random.RandomState(4)
    x = rs.randn(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        t_emb = tenc(torch.from_numpy(x)).numpy()
    j_emb = np.asarray(
        jloss.module.apply(jparams, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(t_emb, j_emb, atol=2e-4)


def test_biomedclip_loss_parity(clip_pair):
    """End-to-end loss at 28x28 grayscale incl. the resize pipeline."""
    tenc, jloss, jparams = clip_pair
    rs = np.random.RandomState(5)
    img = (rs.rand(2, 1, 28, 28).astype(np.float32) * 2 - 1)
    rec = np.clip(img + 0.1 * rs.randn(*img.shape).astype(np.float32), -1, 1)

    with torch.no_grad():
        t_val = _torch_clip_loss(
            tenc, torch.from_numpy(img), torch.from_numpy(rec)
        ).item()
    j_val = float(
        jloss(
            jparams,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            jnp.asarray(rec.transpose(0, 2, 3, 1)),
        )
    )
    assert abs(t_val - j_val) < max(1e-4, 1e-3 * abs(t_val)), (t_val, j_val)


def test_biomedclip_latent_loss_parity(clip_pair):
    """compute_lat_loss branch: latent/4.6 -> channel-pool -> bilinear 224 ->
    encode WITHOUT the CLIP transform (vae_losses.py:168-177)."""
    tenc, _, jparams = clip_pair
    jloss = BiomedCLIPLoss(encoder="simple", compute_rec_loss=False, compute_lat_loss=True)
    rs = np.random.RandomState(7)
    img = (rs.rand(2, 1, 28, 28).astype(np.float32) * 2 - 1)
    lat = rs.randn(2, 4, 7, 7).astype(np.float32)

    with torch.no_grad():
        t_val = _torch_clip_loss(
            tenc, torch.from_numpy(img), rec=None,
            latent=torch.from_numpy(lat), lat_loss=True,
        ).item()
    j_val = float(
        jloss(
            jparams,
            jnp.asarray(img.transpose(0, 2, 3, 1)),
            rec=None,
            latent=jnp.asarray(lat.transpose(0, 2, 3, 1)),
        )
    )
    assert abs(t_val - j_val) < max(1e-4, 1e-3 * abs(t_val)), (t_val, j_val)


def test_biomedclip_gradient_parity(clip_pair):
    tenc, jloss, jparams = clip_pair
    rs = np.random.RandomState(6)
    img = (rs.rand(2, 1, 28, 28).astype(np.float32) * 2 - 1)
    rec = np.clip(img + 0.1 * rs.randn(*img.shape).astype(np.float32), -0.9, 0.9)

    trec = torch.from_numpy(rec).requires_grad_(True)
    t_loss = _torch_clip_loss(tenc, torch.from_numpy(img), trec)
    t_loss.backward()
    t_grad = trec.grad.numpy()

    j_grad = jax.grad(
        lambda r: jloss(jparams, jnp.asarray(img.transpose(0, 2, 3, 1)), r)
    )(jnp.asarray(rec.transpose(0, 2, 3, 1)))
    j_grad = np.asarray(j_grad).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(t_grad, j_grad, atol=1e-5)


# ---------------------------------------------------------------------------
# Torch oracle: the CLIP ViT-B/32 image tower (the reference's PRIMARY path,
# open_clip create_model_and_transforms("ViT-B-32"), vae_losses.py:107-113).
# Oracle re-creates open_clip's VisionTransformer eval math with torch
# primitives (nn.MultiheadAttention pre-LN blocks, erf-GELU as in open_clip's
# ViT-B-32 config), random weights transplanted into CLIPViT.
# ---------------------------------------------------------------------------


class _TorchViTBlock(tnn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.ln1 = tnn.LayerNorm(d)
        self.attn = tnn.MultiheadAttention(d, h, batch_first=True)
        self.ln2 = tnn.LayerNorm(d)
        self.fc = tnn.Linear(d, 4 * d)
        self.proj = tnn.Linear(4 * d, d)

    def forward(self, x):
        h = self.ln1(x)
        x = x + self.attn(h, h, h, need_weights=False)[0]
        h = self.ln2(x)
        return x + self.proj(torch.nn.functional.gelu(self.fc(h)))


class _TorchCLIPViT(tnn.Module):
    def __init__(self, patch=32, width=768, layers=12, heads=12, embed=512):
        super().__init__()
        self.conv = tnn.Conv2d(3, width, patch, stride=patch, bias=False)
        self.cls = tnn.Parameter(torch.randn(width) * 0.02)
        self.pos = tnn.Parameter(torch.randn(50, width) * 0.02)
        self.ln_pre = tnn.LayerNorm(width)
        self.blocks = tnn.ModuleList(
            [_TorchViTBlock(width, heads) for _ in range(layers)]
        )
        self.ln_post = tnn.LayerNorm(width)
        self.proj = tnn.Parameter(torch.randn(width, embed) * width**-0.5)

    def forward(self, x):
        h = self.conv(x)  # (b, w, 7, 7)
        b, w = h.shape[:2]
        h = h.reshape(b, w, -1).permute(0, 2, 1)  # (b, 49, w)
        h = torch.cat([self.cls.expand(b, 1, -1), h], dim=1) + self.pos
        h = self.ln_pre(h)
        for blk in self.blocks:
            h = blk(h)
        return self.ln_post(h[:, 0]) @ self.proj


def _transplant_vit(t: _TorchCLIPViT, jparams):
    flat = dict(flax.traverse_util.flatten_dict(jparams, sep="/"))
    sd = {k: v.detach().numpy() for k, v in t.state_dict().items()}
    flat["params/patch_embed/kernel"] = jnp.asarray(
        sd["conv.weight"].transpose(2, 3, 1, 0)
    )
    flat["params/class_embedding"] = jnp.asarray(sd["cls"])
    flat["params/positional_embedding"] = jnp.asarray(sd["pos"])
    flat["params/proj"] = jnp.asarray(sd["proj"])
    for ln_t, ln_j in (("ln_pre", "ln_pre"), ("ln_post", "ln_post")):
        flat[f"params/{ln_j}/scale"] = jnp.asarray(sd[f"{ln_t}.weight"])
        flat[f"params/{ln_j}/bias"] = jnp.asarray(sd[f"{ln_t}.bias"])
    for i in range(len(t.blocks)):
        p = f"params/block_{i}"
        b = f"blocks.{i}"
        for ln in ("ln1", "ln2"):
            flat[f"{p}/{ln}/scale"] = jnp.asarray(sd[f"{b}.{ln}.weight"])
            flat[f"{p}/{ln}/bias"] = jnp.asarray(sd[f"{b}.{ln}.bias"])
        # torch in_proj packs rows [q; k; v]; flax qkv Dense expects (d, 3d)
        # columns in the same q|k|v order (reshape (..., 3, h, hd) splits the
        # OUTER factor into q/k/v)
        flat[f"{p}/attn/qkv/kernel"] = jnp.asarray(
            sd[f"{b}.attn.in_proj_weight"].T
        )
        flat[f"{p}/attn/qkv/bias"] = jnp.asarray(sd[f"{b}.attn.in_proj_bias"])
        flat[f"{p}/attn/proj/kernel"] = jnp.asarray(
            sd[f"{b}.attn.out_proj.weight"].T
        )
        flat[f"{p}/attn/proj/bias"] = jnp.asarray(sd[f"{b}.attn.out_proj.bias"])
        flat[f"{p}/mlp_fc/kernel"] = jnp.asarray(sd[f"{b}.fc.weight"].T)
        flat[f"{p}/mlp_fc/bias"] = jnp.asarray(sd[f"{b}.fc.bias"])
        flat[f"{p}/mlp_proj/kernel"] = jnp.asarray(sd[f"{b}.proj.weight"].T)
        flat[f"{p}/mlp_proj/bias"] = jnp.asarray(sd[f"{b}.proj.bias"])
    return flax.traverse_util.unflatten_dict(flat, sep="/")


def test_clip_vit_tower_parity():
    from medvae_tpu.losses.clip_vit import CLIPViT

    torch.manual_seed(2)
    # 4 layers is enough to pin every weight mapping + block math while
    # keeping CPU runtime small; the full tower is the same block repeated
    tvit = _TorchCLIPViT(layers=4).eval()
    jvit = CLIPViT(layers=4)
    jparams = _transplant_vit(
        tvit, jvit.init(jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3)))
    )
    rs = np.random.RandomState(8)
    x = rs.randn(2, 3, 224, 224).astype(np.float32) * 0.5
    with torch.no_grad():
        t_emb = tvit(torch.from_numpy(x)).numpy()
    j_emb = np.asarray(
        jvit.apply(jparams, jnp.asarray(x.transpose(0, 2, 3, 1)))
    )
    np.testing.assert_allclose(t_emb, j_emb, atol=5e-4, rtol=1e-4)


def test_biomedclip_vit_loss_runs():
    """BiomedCLIPLoss(encoder='vit') end-to-end: finite, positive, and
    differentiable w.r.t. the reconstruction."""
    loss = BiomedCLIPLoss(encoder="vit")
    # tiny tower for speed
    from medvae_tpu.losses.clip_vit import CLIPViT

    loss.module = CLIPViT(layers=2, width=64, heads=4, embed_dim=32)
    params = loss.init(jax.random.PRNGKey(4))
    rs = np.random.RandomState(9)
    img = jnp.asarray(rs.rand(2, 28, 28, 1).astype(np.float32) * 2 - 1)
    rec = jnp.asarray(rs.rand(2, 28, 28, 1).astype(np.float32) * 2 - 1)
    v, g = jax.value_and_grad(lambda r: loss(params, img, r))(rec)
    assert np.isfinite(float(v)) and float(v) > 0
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
