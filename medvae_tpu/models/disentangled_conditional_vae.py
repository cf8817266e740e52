"""Disentangled Conditional VAE — the flagship model, fully vectorized for TPU.

Capability parity: reference DisentangledConditionalVAE
(src/models/disentangled_conditional_vae.py:14-483):
  * fixed per-modality channel map {0:1, 1:3, 2:3, 3:1, 4:3} (:112-122)
  * base VAE at max_channels=3 with per-modality 1×1 input/output projectors
    (:80-95) and per-modality conv-ReLU-conv decoder heads (:101-110)
  * partitioned latent [z_shared | z_modality] (:195-206)
  * modality-separation loss = −mean pairwise distance of per-modality
    z_modality centroids (:305-349)
  * InfoNCE contrastive loss over L2-normalized z_modality, temperature 0.1,
    same-modality positives (:351-386)
  * mu/logvar clamped to ±10, std to [1e-6, 10] (:398-430)
  * sample_conditional applies a deterministic per-modality latent shift
    (idx−2)·0.3 (:456-482)

TPU-native redesign (the key deviation): the reference processes each sample in
a Python loop, selecting one of 5 small convs per sample (:137-172, :248-301) —
untraceable and serial. Here routing is batched and static-shape:
  * input/output projectors become stacked (M, C, C) matrices gathered per
    sample by modality index and applied as one batched einsum (a 1×1 conv is a
    channel matmul). Identity rows for full-channel modalities reproduce the
    reference's "no projector" case exactly; zero rows/columns reproduce the
    channel-pad/slice behaviour (padded input channels are zero by
    construction, so slicing == multiplying by a zero row).
  * the M decoder heads run as ONE pair of convs: conv1 with M·C outputs, ReLU,
    then a grouped conv2 (feature_group_count=M), and the sample's head is
    selected with a one-hot einsum. At C=3 the 5× redundant FLOPs are noise
    next to the main decoder, and the MXU gets one big conv instead of B tiny
    ones.
NaN scrubbing loops become fused jnp.nan_to_num/clamps, and the batch-level
losses are exact vectorized forms of the reference's unique/masked logic.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from medvae_tpu.models.base_vae import BaseVAE

# Reference channel map (disentangled_conditional_vae.py:112-122):
# chest=1, path=3, oct=3, pneumonia=1, derm=3. Beyond the reference's fixed 5
# modalities, the map extends with the datasets' natural channel policy
# (data/medmnist.py) so all-12 joint training routes channels correctly
# (blood/tissue/retina/breast RGB, the three organ CT views grayscale).
MODALITY_CHANNEL_MAP: Dict[int, int] = {
    0: 1, 1: 3, 2: 3, 3: 1, 4: 3,  # reference's 5
    5: 3, 6: 3, 7: 3, 8: 3, 9: 1, 10: 1, 11: 1,
}


def _channel_map(num_modalities: int) -> Tuple[int, ...]:
    return tuple(
        MODALITY_CHANNEL_MAP.get(m, 3) for m in range(num_modalities)
    )


class DisentangledConditionalVAE(BaseVAE):
    num_modalities: int = 5
    shared_latent_dim: int = 8
    modality_latent_dim: int = 8
    modality_separation_weight: float = 1.0
    contrastive_weight: float = 0.5
    contrastive_temperature: float = 0.1

    @property
    def modality_channels(self) -> Tuple[int, ...]:
        return _channel_map(self.num_modalities)

    @property
    def max_channels(self) -> int:
        return max(self.modality_channels)

    @property
    def total_latent_dim(self) -> int:
        # reference overwrites latent_dim with shared+modality (:50)
        return self.shared_latent_dim + self.modality_latent_dim

    def setup(self):
        # Build the base VAE at max_channels / total latent (reference :56-74).
        # BaseVAE.setup reads self.input_channels / self.latent_dim; linen fields
        # are frozen, so build the encoder/decoder directly with the right values.
        c = self.max_channels
        from medvae_tpu.models.base_vae import _codec_classes

        enc_cls, dec_cls = _codec_classes(self.remat)
        self.encoder = enc_cls(
            ch=self.hidden_channels,
            out_ch=c,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout,
            resamp_with_conv=True,
            in_channels=c,
            resolution=self.resolution,
            z_channels=self.total_latent_dim,
            double_z=self.double_z,
            use_linear_attn=self.use_linear_attn,
            attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
        )
        self.decoder = dec_cls(
            ch=self.hidden_channels,
            out_ch=c,
            ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            dropout=self.dropout,
            resamp_with_conv=True,
            in_channels=c,
            resolution=self.resolution,
            z_channels=self.total_latent_dim,
            use_linear_attn=self.use_linear_attn,
            attn_type=self.attn_type,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            remat=self.remat,
        )

        # Per-modality 1×1 projector params, only for modalities whose natural
        # channel count differs from max (reference :80-95).
        chans = self.modality_channels
        in_proj, out_proj = {}, {}
        for m, cm in enumerate(chans):
            if cm != c:
                in_proj[str(m)] = (
                    self.param(
                        f"in_proj_kernel_{m}",
                        nn.initializers.lecun_normal(),
                        (cm, c),
                        jnp.float32,
                    ),
                    self.param(
                        f"in_proj_bias_{m}", nn.initializers.zeros, (c,), jnp.float32
                    ),
                )
                out_proj[str(m)] = (
                    self.param(
                        f"out_proj_kernel_{m}",
                        nn.initializers.lecun_normal(),
                        (c, cm),
                        jnp.float32,
                    ),
                    self.param(
                        f"out_proj_bias_{m}", nn.initializers.zeros, (cm,), jnp.float32
                    ),
                )
        self._in_proj = in_proj
        self._out_proj = out_proj

        # Modality embedding — declared-but-unused in the reference (:98); kept
        # for checkpoint-surface parity.
        self.modality_embedding = nn.Embed(self.num_modalities, 64, name="modality_embedding")

        # All M decoder heads as one conv pair (see module docstring).
        self.heads_conv1 = nn.Conv(
            self.num_modalities * c, (3, 3), padding=1, dtype=self.dtype,
            name="heads_conv1",
        )
        self.heads_conv2 = nn.Conv(
            self.num_modalities * c,
            (3, 3),
            padding=1,
            feature_group_count=self.num_modalities,
            dtype=self.dtype,
            name="heads_conv2",
        )

    # ------------------------------------------------------------------ #
    # batched modality routing                                           #
    # ------------------------------------------------------------------ #

    def _stacked_input_matrices(self) -> Tuple[jax.Array, jax.Array]:
        """(M, C, C) routing matrices + (M, C) biases for input projection.

        Row layout: matrix[m][i, j] maps input channel i → projected channel j.
        Identity for full-channel modalities; learned (c_m, C) kernel embedded in
        the first c_m rows otherwise (padded input channels hit zero rows —
        exactly the reference's channel slicing since padding is zeros).
        """
        c = self.max_channels
        mats, biases = [], []
        eye = jnp.eye(c, dtype=jnp.float32)
        for m, cm in enumerate(self.modality_channels):
            if str(m) in self._in_proj:
                k, b = self._in_proj[str(m)]
                mat = jnp.zeros((c, c), jnp.float32).at[:cm, :].set(k)
                mats.append(mat)
                biases.append(b)
            else:
                mats.append(eye)
                biases.append(jnp.zeros((c,), jnp.float32))
        return jnp.stack(mats), jnp.stack(biases)

    def _stacked_output_matrices(self) -> Tuple[jax.Array, jax.Array]:
        """(M, C, C) + (M, C) for output projection; invalid output channels are
        zero columns (the reference zero-pads sliced outputs back to C, :283-299)."""
        c = self.max_channels
        mats, biases = [], []
        eye = jnp.eye(c, dtype=jnp.float32)
        for m, cm in enumerate(self.modality_channels):
            if str(m) in self._out_proj:
                k, b = self._out_proj[str(m)]
                mat = jnp.zeros((c, c), jnp.float32).at[:, :cm].set(k)
                mats.append(mat)
                biases.append(jnp.zeros((c,), jnp.float32).at[:cm].set(b))
            else:
                mats.append(eye)
                biases.append(jnp.zeros((c,), jnp.float32))
        return jnp.stack(mats), jnp.stack(biases)

    def encode(
        self,
        x: jax.Array,
        modality_indices: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array]:
        """Batched equivalent of the reference's per-sample projection loop
        (:137-172) followed by the base encode."""
        x = jnp.nan_to_num(x)
        if modality_indices is not None:
            midx = jnp.clip(modality_indices, 0, self.num_modalities - 1)
            w, b = self._stacked_input_matrices()
            wb = w[midx].astype(x.dtype)  # (B, C, C)
            bb = b[midx].astype(x.dtype)  # (B, C)
            x = (
                jnp.einsum("bhwc,bcd->bhwd", x, wb, preferred_element_type=jnp.float32)
                + bb[:, None, None, :]
            ).astype(x.dtype)
            x = jnp.nan_to_num(x)
        h = self.encoder(x, deterministic)
        mu, logvar = jnp.split(h, 2, axis=-1)
        return jnp.nan_to_num(mu), jnp.nan_to_num(logvar)

    def decode(
        self,
        z: jax.Array,
        modality_indices: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        """Base decode, then batched modality heads + output projection
        (reference per-sample loop :248-301)."""
        recon = self.decoder(z, deterministic)
        if modality_indices is None:
            return recon
        b, hh, ww, c = recon.shape
        m = self.num_modalities
        midx = jnp.clip(modality_indices, 0, m - 1)
        onehot = jax.nn.one_hot(midx, m, dtype=recon.dtype)

        h = nn.relu(self.heads_conv1(recon))
        h = self.heads_conv2(h)  # (B,H,W,M*C), group g = head g's output
        h = h.reshape(b, hh, ww, m, c)
        routed = jnp.einsum("bhwmc,bm->bhwc", h, onehot)

        w_out, b_out = self._stacked_output_matrices()
        wb = w_out[midx].astype(routed.dtype)
        bb = b_out[midx].astype(routed.dtype)
        out = (
            jnp.einsum("bhwc,bcd->bhwd", routed, wb, preferred_element_type=jnp.float32)
            + bb[:, None, None, :]
        ).astype(routed.dtype)
        return out

    # ------------------------------------------------------------------ #
    # latent partitioning & disentanglement losses                        #
    # ------------------------------------------------------------------ #

    def partition_latent(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Split the flattened latent into shared / modality parts (ref :195-206).
        Flattening uses torch's (C,H,W) order so 'dimension k' means the same
        latent coordinate in both frameworks."""
        b = z.shape[0]
        z_flat = jnp.transpose(z, (0, 3, 1, 2)).reshape(b, -1)
        z_shared = z_flat[:, : self.shared_latent_dim]
        z_modality = z_flat[
            :, self.shared_latent_dim : self.shared_latent_dim + self.modality_latent_dim
        ]
        return z_shared, z_modality

    def reconstruct_latent(
        self, z_shared: jax.Array, z_modality: jax.Array
    ) -> jax.Array:
        """Inverse of partition_latent, zero-padding the tail (ref :208-239)."""
        b = z_shared.shape[0]
        r = self.encoder_out_res
        full = r * r * self.total_latent_dim
        used = self.shared_latent_dim + self.modality_latent_dim
        z_full = jnp.concatenate(
            [z_shared, z_modality, jnp.zeros((b, full - used), z_shared.dtype)], axis=1
        )
        z = z_full.reshape(b, self.total_latent_dim, r, r)
        return jnp.transpose(z, (0, 2, 3, 1))

    def modality_separation_loss(
        self, z: jax.Array, modality_indices: jax.Array
    ) -> jax.Array:
        """−mean pairwise distance between per-modality centroids of z_modality,
        over modalities present in the batch (reference :305-349, pdist path)."""
        _, z_mod = self.partition_latent(z)
        z_mod = z_mod.astype(jnp.float32)
        m = self.num_modalities
        onehot = jax.nn.one_hot(modality_indices, m, dtype=jnp.float32)  # (B, M)
        counts = onehot.sum(axis=0)  # (M,)
        sums = onehot.T @ z_mod  # (M, D)
        centroids = sums / jnp.maximum(counts, 1.0)[:, None]
        present = counts > 0

        diff = centroids[:, None, :] - centroids[None, :, :]  # (M, M, D)
        sq = jnp.sum(diff * diff, axis=-1)
        # tiny epsilon keeps the sqrt gradient finite at coincident centroids
        dist = jnp.sqrt(sq + 1e-12)
        iu = jnp.triu(jnp.ones((m, m), bool), k=1)
        pair_mask = iu & present[:, None] & present[None, :]
        n_pairs = jnp.sum(pair_mask)
        mean_dist = jnp.sum(jnp.where(pair_mask, dist, 0.0)) / jnp.maximum(n_pairs, 1)
        # 0 when fewer than 2 modalities present (reference :321-322)
        return jnp.where(n_pairs > 0, -mean_dist, 0.0)

    def contrastive_loss(
        self, z: jax.Array, modality_indices: jax.Array
    ) -> jax.Array:
        """InfoNCE over L2-normalized z_modality with same-modality positives
        (reference :351-386, temperature 0.1, +1e-8 log guard)."""
        _, z_mod = self.partition_latent(z)
        z_mod = z_mod.astype(jnp.float32)
        b = z_mod.shape[0]
        norm = jnp.linalg.norm(z_mod, axis=1, keepdims=True)
        z_n = z_mod / jnp.maximum(norm, 1e-12)
        sim = (z_n @ z_n.T) / self.contrastive_temperature  # (B, B)
        eye = jnp.eye(b, dtype=bool)
        same = (modality_indices[:, None] == modality_indices[None, :]) & ~eye
        exp_sim = jnp.exp(sim)
        pos = jnp.sum(jnp.where(same, exp_sim, 0.0), axis=1)
        all_sim = jnp.sum(exp_sim, axis=1) - jnp.diagonal(exp_sim)
        per_sample = -jnp.log(pos / jnp.maximum(all_sim, 1e-12) + 1e-8)
        valid = pos > 0
        n_valid = jnp.sum(valid)
        loss = jnp.sum(jnp.where(valid, per_sample, 0.0)) / jnp.maximum(n_valid, 1)
        return jnp.where(n_valid > 0, loss, 0.0)

    # ------------------------------------------------------------------ #
    # forward / sampling                                                 #
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        x: jax.Array,
        modality_indices: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
        return_latents: bool = False,
        noise: Optional[jax.Array] = None,
    ) -> Dict[str, jax.Array]:
        if modality_indices is None:
            modality_indices = jnp.zeros((x.shape[0],), jnp.int32)
        mu, logvar = self.encode(x, modality_indices, deterministic=deterministic)
        # numerical guards fused into the graph (reference :398-430)
        logvar = jnp.clip(logvar, -10.0, 10.0)
        mu = jnp.clip(mu, -10.0, 10.0)
        z = self.reparameterize(mu, logvar, noise=noise)
        reconstruction = self.decode(z, modality_indices, deterministic=deterministic)

        separation_loss = self.modality_separation_loss(z, modality_indices)
        contrastive_loss_val = self.contrastive_loss(z, modality_indices)

        output = {
            "reconstruction": reconstruction,
            "mean": mu,
            "logvar": logvar,
            "mu": mu,
            "z": z,
            "separation_loss": separation_loss,
            "contrastive_loss": contrastive_loss_val,
        }
        if return_latents:
            z_shared, z_modality = self.partition_latent(z)
            output.update({"z_shared": z_shared, "z_modality": z_modality})
        return output

    def sample_conditional(
        self, num_samples: int, modality_indices: jax.Array, rng: jax.Array
    ) -> jax.Array:
        """Prior sample with the reference's deterministic per-modality shift
        (idx−2)·0.3 (:456-482), decoded through the routed heads."""
        r = self.encoder_out_res
        z = jax.random.normal(
            rng, (num_samples, r, r, self.total_latent_dim), self.dtype
        )
        shift = (modality_indices.astype(self.dtype) - 2.0) * 0.3
        z = z + shift[:, None, None, None]
        return self.decode(z, modality_indices)
