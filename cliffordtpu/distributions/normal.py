"""Diagonal Gaussian — the baseline latent family.

Minimal pytree implementation of the pieces of ``torch.distributions.Normal``
the reference models use (``mnist/mlp_vae.py:76-80``,
``cnn/models.py:211-220``): reparameterized sampling, elementwise log_prob /
entropy, and the closed-form KL between two Gaussians.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Normal:
    loc: jnp.ndarray
    scale: jnp.ndarray

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + jnp.broadcast_shapes(
            self.loc.shape, self.scale.shape
        )
        eps = jax.random.normal(key, shape, dtype=self.loc.dtype)
        return self.loc + self.scale * eps

    rsample = sample

    def log_prob(self, value):
        var = self.scale**2
        return (
            -((value - self.loc) ** 2) / (2 * var)
            - jnp.log(self.scale)
            - 0.5 * math.log(2 * math.pi)
        )

    def entropy(self):
        return 0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(self.scale)


def kl_normal_normal(q: Normal, p: Normal):
    """Elementwise KL(q || p) for diagonal Gaussians."""
    var_ratio = (q.scale / p.scale) ** 2
    t1 = ((q.loc - p.loc) / p.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
