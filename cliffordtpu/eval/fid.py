"""Fréchet distance between prior decodes and the test set
(``utils/wandb_utils.py:1555-1596``).

The reference uses torchmetrics' InceptionV3-2048 features.  This
environment has no Inception weights (zero egress), so the feature
extractor is pluggable:

* ``"inception"`` — loads an InceptionV3 feature npz from
  ``$CLIFFORDTPU_INCEPTION`` when present (true FID),
* ``"random_conv"`` (default fallback) — a fixed, seed-42 random 4-layer
  conv net.  Random-projection Fréchet distances are a recognized FID
  surrogate (features are distribution-sensitive); scores are comparable
  *within* a run across models/latents — which is how the experiment
  tables use FID — but are NOT on the Inception-FID scale.  The returned
  dict carries ``fid_features`` so artifacts are self-describing.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.eval.prior import sample_prior_z

_FEATURE_DIM = 512


def _random_conv_features(images: jnp.ndarray, key) -> jnp.ndarray:
    """Fixed random conv features: 4x (conv3x3 stride2 + leaky_relu), then
    global mean+max pooling concat -> ~512 dims. images: (B, H, W, 3) in
    [0, 1]."""
    chans = [32, 64, 128, 256]
    x = images * 2.0 - 1.0
    k = key
    for i, ch in enumerate(chans):
        k, sub = jax.random.split(k)
        w = jax.random.normal(sub, (3, 3, x.shape[-1], ch)) * (
            1.0 / np.sqrt(9 * x.shape[-1]))
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.leaky_relu(x, 0.2)
    mean_pool = x.mean(axis=(1, 2))
    max_pool = x.max(axis=(1, 2))
    return jnp.concatenate([mean_pool, max_pool], -1)


def _sqrtm_psd(c: np.ndarray) -> np.ndarray:
    """Symmetric PSD square root via eigendecomposition.  Unlike generic
    ``scipy.linalg.sqrtm`` this stays finite on the rank-deficient
    covariances that small sample counts produce."""
    w, v = np.linalg.eigh((c + c.T) / 2.0)
    return (v * np.sqrt(np.clip(w, 0, None))) @ v.T


def _frechet(mu1, cov1, mu2, cov2) -> float:
    """||mu1-mu2||^2 + Tr(C1 + C2 - 2 (C1 C2)^(1/2)) via symmetric eig."""
    diff = mu1 - mu2
    # sqrtm(C1 C2) trace == sum sqrt eig(C1^(1/2) C2 C1^(1/2))
    s1 = _sqrtm_psd(cov1)
    inner = s1 @ cov2 @ s1
    eigs = np.linalg.eigvalsh((inner + inner.T) / 2.0)
    tr_sqrt = np.sum(np.sqrt(np.clip(eigs, 0, None)))
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


_INCEPTION_CACHE: dict = {}


def _get_features(images01: np.ndarray, extractor: str, batch: int = 256):
    """Dispatch on ``extractor``.  The label returned by ``compute_fid``
    must always match the computation that actually ran, so unknown
    extractors and a missing inception weights path are hard errors —
    never a silent surrogate."""
    if extractor == "inception":
        from cliffordtpu.eval.inception import (
            inception_features,
            load_inception_params,
        )

        path = os.environ.get("CLIFFORDTPU_INCEPTION")
        if not path:
            raise RuntimeError(
                "feature_extractor='inception' requires "
                "$CLIFFORDTPU_INCEPTION to point at an InceptionV3 "
                "state-dict npz (see cliffordtpu/eval/inception.py)")
        if path not in _INCEPTION_CACHE:
            _INCEPTION_CACHE.clear()
            _INCEPTION_CACHE[path] = load_inception_params(path)
        return inception_features(images01, _INCEPTION_CACHE[path],
                                  batch=min(batch, 32))
    if extractor != "random_conv":
        raise ValueError(f"unknown feature extractor {extractor!r}")
    feats = []
    key = jax.random.PRNGKey(42)
    for s in range(0, len(images01), batch):
        x = jnp.asarray(images01[s:s + batch])
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        feats.append(np.asarray(_random_conv_features(x, key)))
    return np.concatenate(feats, 0)


def compute_fid(
    handle, x_test, dist_name: str, latent_dim: int,
    in_channels: int = 3, n_samples: int = 2048, batch_size: int = 256,
    key=None, feature_extractor: str = "auto",
) -> Dict:
    """FID(prior decodes, test set).  See module docstring re features."""
    key = key if key is not None else jax.random.PRNGKey(0)
    if feature_extractor == "auto":
        feature_extractor = (
            "inception" if os.environ.get("CLIFFORDTPU_INCEPTION")
            else "random_conv")

    # real images -> [0,1]
    real = np.clip(np.asarray(x_test[:n_samples]) * 0.5 + 0.5, 0, 1)

    # fake: decode prior samples
    l2n = getattr(handle.model, "l2_normalize", False)
    fakes = []
    n_done = 0
    while n_done < n_samples:
        bs = min(batch_size, n_samples - n_done)
        z = sample_prior_z(
            jax.random.fold_in(key, n_done), dist_name, latent_dim, bs,
            l2_normalize=l2n, num_tokens=handle.num_tokens,
        )
        from cliffordtpu.eval.plots import to_image

        imgs = np.asarray(to_image(handle, handle.decode(z)))
        fakes.append(imgs.reshape(imgs.shape[0], *real.shape[1:]))
        n_done += bs
    fake = np.concatenate(fakes, 0)

    f_real = _get_features(real, feature_extractor)
    f_fake = _get_features(fake, feature_extractor)
    mu_r, cov_r = f_real.mean(0), np.cov(f_real, rowvar=False)
    mu_f, cov_f = f_fake.mean(0), np.cov(f_fake, rowvar=False)
    score = _frechet(mu_r, cov_r, mu_f, cov_f)
    return {"fid": score, "fid_features": feature_extractor}
