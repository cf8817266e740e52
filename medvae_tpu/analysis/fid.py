"""Fréchet distance between feature distributions (FID).

Parity: reference compute_fid_score (src/utils/metrics.py:104-135). NOTE the
reference has a real bug there: it uses the *element-wise* sqrt of Σ₁Σ₂ instead
of the matrix square root (SURVEY §7 "faithful quirk decisions"). Both variants
are provided: `fid_score` (correct, eigendecomposition-based matrix sqrt) and
`fid_score_reference_quirk` (bit-compatible with the reference's math for
comparison against its historical numbers). Statistics (mean/cov) are computed
on device in jnp; the small symmetric eigendecomposition runs wherever jnp puts
it (D×D, D = feature dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _stats(feats: jax.Array):
    feats = feats.astype(jnp.float32)
    mu = jnp.mean(feats, axis=0)
    xc = feats - mu
    cov = (xc.T @ xc) / jnp.maximum(feats.shape[0] - 1, 1)
    return mu, cov


def fid_score(real_features, fake_features) -> float:
    """FID = ‖μ₁−μ₂‖² + tr(Σ₁+Σ₂−2·(Σ₁Σ₂)^½) with a proper matrix sqrt.

    tr((Σ₁Σ₂)^½) is computed stably as Σ√λᵢ of Σ₁^½ Σ₂ Σ₁^½ (symmetric PSD),
    avoiding scipy.linalg.sqrtm.
    """
    mu1, s1 = _stats(jnp.asarray(real_features))
    mu2, s2 = _stats(jnp.asarray(fake_features))
    diff = mu1 - mu2

    # Σ₁^½ via eigendecomposition (symmetric PSD)
    w1, v1 = jnp.linalg.eigh(s1)
    w1 = jnp.clip(w1, 0.0, None)
    s1_half = (v1 * jnp.sqrt(w1)) @ v1.T
    inner = s1_half @ s2 @ s1_half
    wi = jnp.clip(jnp.linalg.eigvalsh(inner), 0.0, None)
    tr_sqrt = jnp.sum(jnp.sqrt(wi))

    fid = diff @ diff + jnp.trace(s1) + jnp.trace(s2) - 2.0 * tr_sqrt
    return float(fid)


def fid_score_reference_quirk(real_features, fake_features) -> float:
    """The reference's computation verbatim in spirit: element-wise
    np.sqrt(Σ₁·Σ₂) (matrix product, element-wise sqrt) — WRONG math, kept only
    for comparing against numbers produced by the reference implementation."""
    real = np.asarray(real_features, np.float64)
    fake = np.asarray(fake_features, np.float64)
    mu1, s1 = real.mean(axis=0), np.cov(real, rowvar=False)
    mu2, s2 = fake.mean(axis=0), np.cov(fake, rowvar=False)
    diff = mu1 - mu2
    covmean = np.sqrt(s1.dot(s2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(s1 + s2 - 2 * covmean))
