"""Prior sampling per distribution (``utils/wandb_utils.py:1536-1553`` and
the per-token path of ``cnn/fashion_train.py:540-563``)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cliffordtpu.ops.torus import angles_to_torus


def sample_prior_z(key, dist_name: str, latent_dim: int, n: int,
                   l2_normalize: bool = False, num_tokens: int | None = None):
    """n latent vectors from the prior; per-token models get (n, T * dec_dim)
    flat latents when ``num_tokens`` is given."""
    if num_tokens is not None:
        flat = sample_prior_z(key, dist_name, latent_dim, n * num_tokens,
                              l2_normalize=l2_normalize)
        return flat.reshape(n, -1)
    if dist_name == "clifford":
        angles = jax.random.uniform(key, (n, latent_dim)) * (2 * math.pi)
        return angles_to_torus(angles)
    z = jax.random.normal(key, (n, latent_dim))
    if dist_name == "powerspherical" or l2_normalize:
        z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-8)
    return z
