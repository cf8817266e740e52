"""Numerical parity vs the reference PyTorch implementation.

The reference repo (read-only at /root/reference) is used purely as a test
oracle: we instantiate its torch Encoder/Decoder, transplant the weights into
our Flax modules (NCHW→NHWC layout conversion), and require the outputs to
match on the same inputs. This pins the architecture semantics (GroupNorm
grouping/eps, swish, asymmetric downsample padding, attention math, double_z
split order) far more tightly than shape tests.

Skipped when torch or the reference checkout is unavailable.
"""

import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "src")):
    pytest.skip("reference checkout unavailable", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

import jax  # noqa: E402

from medvae_tpu.nn.encoder_decoder import Decoder as JDecoder, Encoder as JEncoder  # noqa: E402

from src.models.encoder_decoder import (  # noqa: E402  (oracle import)
    Decoder as TDecoder,
    Encoder as TEncoder,
)

CFG = dict(
    ch=16,
    out_ch=1,
    ch_mult=(1, 2),
    num_res_blocks=1,
    attn_resolutions=[8],  # attention fires at the 8×8 level AND in mid
    dropout=0.0,
    resamp_with_conv=True,
    in_channels=1,
    resolution=16,
    z_channels=4,
)


def _flax_path_from_torch_key(key: str):
    """Map a torch state_dict key to the flax param path."""
    parts = key.split(".")
    p = parts[-1]  # weight | bias
    mods = parts[:-1]

    if mods[0] in ("down", "up"):
        kind, i, kind_sub, j = mods[0], mods[1], mods[2], mods[3] if len(mods) > 3 else None
        if kind_sub in ("block", "attn"):
            name = f"{kind}_{i}_{kind_sub}_{j}"
            rest = mods[4:]
        elif kind_sub in ("downsample", "upsample"):
            name = f"{kind}_{i}_{kind_sub}"
            rest = mods[3:]
        else:
            raise KeyError(key)
        return (name, *rest, p)
    if mods[0] == "mid":
        name = f"mid_{mods[1]}"
        return (name, *mods[2:], p)
    # conv_in / conv_out / norm_out
    return (*mods, p)


def _convert(value: np.ndarray, path):
    leaf = path[-1]
    if leaf == "weight":
        if value.ndim == 4:  # conv: (Co, Ci, kh, kw) -> (kh, kw, Ci, Co)
            return np.transpose(value, (2, 3, 1, 0)), "kernel"
        return value, "scale"  # norm affine
    return value, "bias"


def _transplant(tmodel: torch.nn.Module, jparams):
    import flax

    flat = dict(flax.traverse_util.flatten_dict(jparams, sep="§"))
    for key, tensor in tmodel.state_dict().items():
        path = _flax_path_from_torch_key(key)
        value, new_leaf = _convert(tensor.detach().numpy(), path)
        jpath = "§".join([*path[:-1], new_leaf])
        assert jpath in flat, f"no flax param for torch key {key} -> {jpath}"
        assert flat[jpath].shape == value.shape, (key, flat[jpath].shape, value.shape)
        flat[jpath] = jnp.asarray(value)
    return flax.traverse_util.unflatten_dict(flat, sep="§")


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_encoder_parity(rng):
    torch.manual_seed(0)
    tenc = TEncoder(**CFG, double_z=True).eval()
    jenc = JEncoder(
        ch=CFG["ch"], out_ch=CFG["out_ch"], ch_mult=CFG["ch_mult"],
        num_res_blocks=CFG["num_res_blocks"],
        attn_resolutions=tuple(CFG["attn_resolutions"]), dropout=0.0,
        in_channels=CFG["in_channels"], resolution=CFG["resolution"],
        z_channels=CFG["z_channels"], double_z=True,
    )
    x = rng.rand(2, 16, 16, 1).astype(np.float32) * 2 - 1
    jparams = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    jparams = _transplant(tenc, jparams)

    out_j = np.asarray(jenc.apply({"params": jparams}, jnp.asarray(x)))
    with torch.no_grad():
        out_t = tenc(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)


def test_decoder_parity(rng):
    torch.manual_seed(1)
    tdec = TDecoder(**CFG).eval()
    jdec = JDecoder(
        ch=CFG["ch"], out_ch=CFG["out_ch"], ch_mult=CFG["ch_mult"],
        num_res_blocks=CFG["num_res_blocks"],
        attn_resolutions=tuple(CFG["attn_resolutions"]), dropout=0.0,
        in_channels=CFG["in_channels"], resolution=CFG["resolution"],
        z_channels=CFG["z_channels"],
    )
    z = rng.rand(2, 8, 8, CFG["z_channels"]).astype(np.float32)
    jparams = jdec.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"]
    jparams = _transplant(tdec, jparams)

    out_j = np.asarray(jdec.apply({"params": jparams}, jnp.asarray(z)))
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(np.transpose(z, (0, 3, 1, 2))))
    out_t = np.transpose(out_t.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)
