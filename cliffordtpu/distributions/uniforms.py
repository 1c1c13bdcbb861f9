"""Uniform reference measures: hypersphere and Clifford torus.

JAX pytree dataclasses (samplers take explicit PRNG keys).  Two sphere-dim
conventions exist in the reference and BOTH are preserved here because the
callers compensate for them (``mnist/mlp_vae.py:83,91``):

* ``HypersphericalUniform(dim=d)``      — S^{d-1} in R^d
  (``dists/clifford.py:85-121``), used with PowerSpherical.
* ``VMFHypersphericalUniform(dim=d)``   — S^{d}   in R^{d+1}
  (``vmf/hyperspherical_vae/distributions/hyperspherical_uniform.py:5-54``),
  used with VonMisesFisher; callers pass ``z_dim - 1``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from cliffordtpu.ops.torus import angles_to_torus

_EPS = 1e-7


@struct.dataclass
class HypersphericalUniform:
    """Uniform on S^(dim-1) embedded in R^dim (``dists/clifford.py:85-121``)."""

    dim: int = struct.field(pytree_node=False)

    def sample(self, key, sample_shape=()):
        v = jax.random.normal(key, tuple(sample_shape) + (self.dim,))
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + _EPS)

    rsample = sample

    def log_prob(self, value):
        const = (
            math.lgamma(self.dim / 2)
            - (math.log(2) + (self.dim / 2) * math.log(math.pi))
        )
        return jnp.full(value.shape[:-1], const, dtype=value.dtype)

    def entropy(self):
        return -(
            math.lgamma(self.dim / 2)
            - (math.log(2) + (self.dim / 2) * math.log(math.pi))
        )


@struct.dataclass
class VMFHypersphericalUniform:
    """Uniform on S^dim in R^(dim+1) — the vendored s-vae convention
    (``vmf/.../hyperspherical_uniform.py:29-54``)."""

    dim: int = struct.field(pytree_node=False)

    def sample(self, key, sample_shape=()):
        v = jax.random.normal(key, tuple(sample_shape) + (self.dim + 1,))
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    rsample = sample

    def _log_surface_area(self):
        return (
            math.log(2)
            + ((self.dim + 1) / 2) * math.log(math.pi)
            - math.lgamma((self.dim + 1) / 2)
        )

    def log_prob(self, value):
        return jnp.full(
            value.shape[:-1], -self._log_surface_area(), dtype=value.dtype
        )

    def entropy(self):
        return self._log_surface_area()


@struct.dataclass
class CliffordTorusUniform:
    """Uniform on the Clifford torus (S^1)^d embedded in R^{2d}
    (``dists/clifford.py:215-242``).

    Only d-1 angles are free (index 0 pinned), hence
    ``entropy = (d-1) log 2 pi`` and ``log_prob = -entropy``.
    """

    dim: int = struct.field(pytree_node=False)

    def sample(self, key, sample_shape=()):
        angles = (
            jax.random.uniform(key, tuple(sample_shape) + (self.dim,))
            * 2.0
            * math.pi
        )
        return angles_to_torus(angles)

    rsample = sample

    def log_prob(self, value):
        return jnp.full(value.shape[:-1], -self.entropy(), dtype=value.dtype)

    def entropy(self):
        return (self.dim - 1) * math.log(2 * math.pi)
