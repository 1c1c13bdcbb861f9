"""Shared posterior/prior construction for all VAE families.

One place for the duck-typed contract the reference spreads across
``mnist/mlp_vae.py:73-95``, ``cnn/models.py:211-233`` and
``cnn/cliffordar_model.py:470-501``: given the encoder heads' outputs,
build (q_z, p_z) and draw a reparameterized sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cliffordtpu.distributions import (
    CliffordPowerSphericalDistribution,
    CliffordTorusUniform,
    HypersphericalUniform,
    Normal,
    PowerSpherical,
    VMFHypersphericalUniform,
    VonMisesFisher,
)

DISTRIBUTIONS = ("normal", "gaussian", "powerspherical", "vmf", "clifford")


def reparameterize(distribution: str, z_mean, z_param2, z_dim: int):
    """Build (q_z, p_z) from encoder head outputs.

    Mirrors ``mnist/mlp_vae.py:73-95``: for "normal", ``z_param2`` is the
    log-variance; for the spherical families it is the concentration.
    Note the vMF uniform gets ``z_dim - 1`` (its S^d-in-R^{d+1} convention,
    ``mlp_vae.py:91``).
    """
    if distribution in ("normal", "gaussian"):
        std = jnp.exp(0.5 * z_param2) + 1e-6
        q_z = Normal(z_mean, std)
        p_z = Normal(jnp.zeros_like(z_mean), jnp.ones_like(std))
    elif distribution == "powerspherical":
        scale = z_param2
        if scale.ndim == z_mean.ndim:
            scale = scale[..., 0]  # squeeze the scalar-kappa head
        q_z = PowerSpherical(z_mean, scale)
        p_z = HypersphericalUniform(z_dim)
    elif distribution == "vmf":
        q_z = VonMisesFisher(z_mean, z_param2)
        p_z = VMFHypersphericalUniform(z_dim - 1)
    elif distribution == "clifford":
        q_z = CliffordPowerSphericalDistribution(z_mean, z_param2)
        p_z = CliffordTorusUniform(z_dim)
    else:
        raise ValueError(f"unknown distribution: {distribution}")
    return q_z, p_z


def sample_latent(key, distribution: str, q_z, l2_normalize: bool = False):
    """Draw one reparameterized latent (``mlp_vae.py:100-102``)."""
    z = q_z.sample(key)
    if distribution in ("normal", "gaussian") and l2_normalize:
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True))
    return z
