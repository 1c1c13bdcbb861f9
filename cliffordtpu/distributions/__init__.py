"""Latent distribution layer (L1) — JAX pytree distributions.

Mirrors the public surface of the reference's ``dists/__init__.py:1-15`` plus
the vendored vMF package, with explicit-key sampling throughout.
"""

from cliffordtpu.distributions import bessel
from cliffordtpu.distributions.clifford_torus import (
    CliffordPowerSphericalDistribution,
    CliffordTorusDistribution,
)
from cliffordtpu.distributions.kl import kl_divergence, register_kl
from cliffordtpu.distributions.normal import Normal
from cliffordtpu.distributions.power_spherical import (
    PowerSpherical,
    householder_reflect,
)
from cliffordtpu.distributions.uniforms import (
    CliffordTorusUniform,
    HypersphericalUniform,
    VMFHypersphericalUniform,
)
from cliffordtpu.distributions.von_mises_fisher import VonMisesFisher

__all__ = [
    "bessel",
    "CliffordPowerSphericalDistribution",
    "CliffordTorusDistribution",
    "CliffordTorusUniform",
    "HypersphericalUniform",
    "Normal",
    "PowerSpherical",
    "VMFHypersphericalUniform",
    "VonMisesFisher",
    "householder_reflect",
    "kl_divergence",
    "register_kl",
]
