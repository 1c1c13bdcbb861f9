"""Clifford-torus latent distributions — the paper's core contribution.

Rebuilds ``dists/clifford.py:245-322`` TPU-first:

* ``CliffordPowerSphericalDistribution`` — per-circle PowerSpherical
  concentration with the wrapped-phase reparameterization
  ``theta = loc + atan2(v1, v0)`` (fully differentiable, rejection-free),
  followed by the Hermitian-spectrum embedding.  The complex iFFT of the
  reference (``:301-308``) is replaced by the exact real-DFT matmul in
  ``cliffordtpu.ops.torus`` (MXU-friendly, see that module).

* ``CliffordTorusDistribution`` — product of von Mises on the torus.  The
  reference samples with torch's rejection sampler and is explicitly
  non-differentiable (``:259-262``); here sampling uses a fixed-budget
  Best–Fisher rejection (jit/vmap-safe) under ``stop_gradient``.

Quirks preserved on purpose (documented, verified by tests):
  * angle index 0 is pinned to phase 0 — only d-1 angles are free;
  * ``entropy`` sums circles 1..d-1 (``:318-322``) while ``log_prob`` sums
    ALL d circles including the pinned one (``:310-316``).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
from flax import struct

from cliffordtpu.distributions.bessel import von_mises_entropy
from cliffordtpu.distributions.power_spherical import PowerSpherical
from cliffordtpu.ops.torus import angles_to_torus, torus_to_angles

_EPS = 1e-7


def _sample_von_mises(key, loc, concentration, sample_shape=(), n_rounds: int = 32):
    """Best–Fisher (1979) wrapped-Cauchy rejection sampler, fixed budget.

    Replaces torch's data-dependent rejection loop with ``n_rounds``
    proposals and a first-accept select so it compiles under jit.  With
    kappa <= 10 (the encoder clamp) acceptance is ~66%+ per round, so the
    probability all 32 rounds miss is < 1e-15; the fallback is ``loc``.
    Non-differentiable by design, like ``dists/clifford.py:259-262``.
    """
    shape = tuple(sample_shape) + jnp.broadcast_shapes(
        loc.shape, concentration.shape
    )
    kappa = jnp.broadcast_to(concentration, shape)
    mu = jnp.broadcast_to(loc, shape)

    safe_kappa = jnp.maximum(kappa, 1e-5)
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * safe_kappa**2)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * safe_kappa)
    r = (1.0 + rho**2) / (2.0 * rho)

    u = jax.random.uniform(key, (n_rounds, 3) + shape, minval=1e-7, maxval=1.0 - 1e-7)
    z = jnp.cos(math.pi * u[:, 0])
    f = (1.0 + r * z) / (r + z)
    c = safe_kappa * (r - f)
    accept = jnp.logical_or(
        c * (2.0 - c) - u[:, 1] > 0.0,
        jnp.log(c / u[:, 1]) + 1.0 - c >= 0.0,
    )
    theta = jnp.sign(u[:, 2] - 0.5) * jnp.arccos(jnp.clip(f, -1.0, 1.0))
    # first accepted round per element
    idx = jnp.argmax(accept, axis=0)
    any_accept = jnp.any(accept, axis=0)
    chosen = jnp.take_along_axis(theta, idx[None], axis=0)[0]
    delta = jnp.where(any_accept, chosen, 0.0)
    # tiny kappa -> uniform angle
    uniform = (u[0, 0] * 2.0 - 1.0) * math.pi
    delta = jnp.where(kappa < 1e-4, uniform, delta)
    return jax.lax.stop_gradient(mu + delta)


@struct.dataclass
class CliffordTorusDistribution:
    """Product of von Mises on the Clifford torus (``dists/clifford.py:245-278``).

    event_shape = (2 * d,) where d = loc.shape[-1].
    """

    loc: jnp.ndarray  # (..., d) mean angles
    concentration: jnp.ndarray  # (..., d) or broadcastable

    @property
    def orig_dim(self) -> int:
        return self.loc.shape[-1]

    def _params(self):
        return jnp.broadcast_arrays(self.loc, self.concentration)

    def sample(self, key, sample_shape=()):
        loc, kappa = self._params()
        theta = _sample_von_mises(key, loc, kappa, sample_shape)
        return angles_to_torus(theta)

    rsample = sample  # reference calls it rsample but it is not differentiable

    def entropy(self):
        _, kappa = self._params()
        return von_mises_entropy(kappa)[..., 1:].sum(-1)


@struct.dataclass
class CliffordPowerSphericalDistribution:
    """Clifford torus with PowerSpherical per-circle concentration
    (``dists/clifford.py:281-322``) — fully reparameterized."""

    loc: jnp.ndarray  # (..., d) mean angles
    concentration: jnp.ndarray  # (..., d) or broadcastable

    @property
    def orig_dim(self) -> int:
        return self.loc.shape[-1]

    def _params(self):
        return jnp.broadcast_arrays(self.loc, self.concentration)

    def _circle_ps(self, loc_angles, kappa):
        mean_dirs = jnp.stack([jnp.cos(loc_angles), jnp.sin(loc_angles)], -1)
        return PowerSpherical(mean_dirs, kappa)

    def sample(self, key, sample_shape=()):
        """Wrapped-phase reparameterization (``dists/clifford.py:295-308``):
        draw v ~ PS(e1 in R^2, kappa) per circle, theta = loc + atan2(v1, v0),
        then the Hermitian real-DFT embedding.

        The d=2 PowerSpherical is replaced by an exact CLOSED-FORM circle
        sampler (no Gamma/Beta rejection machinery at all): the PS(S^1,
        kappa) density is p(theta) ∝ (1 + cos theta)^k = (2 cos^2(theta/2))^k,
        so tan(theta/2) is a Student-t with nu = 2k+1 degrees of freedom
        scaled by 1/sqrt(nu), and Student-t has Bailey's exact two-uniform
        polar representation T = cos(2 pi V) * sqrt(nu (U^(-2/nu) - 1)).
        The sqrt(nu) scalings cancel:

            theta = loc + 2 atan( cos(2 pi V) * sqrt(expm1(-(2/nu) ln U)) )

        Pure elementwise, two uniforms per angle, pathwise-differentiable
        in kappa through nu (no implicit diff, no while_loop — the
        jax.random.gamma loop cost ~1.1 ms/step of the flagship profile).
        Distribution equality with the generic path is asserted by
        tests/test_distributions.py (moments) and was KS-tested against
        scipy.stats.t (p ~ 0.2-0.3 at n=4e5).
        """
        from cliffordtpu.distributions.power_spherical import _EPS as _PS_EPS

        loc, kappa = self._params()
        sampler_env = os.environ.get("CLIFFORDTPU_SAMPLER")
        if not sample_shape and sampler_env in ("pallas_rng", "pallas_keyed"):
            # opt-in fused sampler+embed kernels (kernels/sampler_pallas.py),
            # identical formula and epsilons:
            #   pallas_rng   — TPU hardware PRNG, DIFFERENT random stream
            #   pallas_keyed — in-kernel threefry on jax.random's counters,
            #                  SAME stream (u, v bit-identical to this path)
            if sampler_env == "pallas_rng":
                from cliffordtpu.kernels.sampler_pallas import (
                    sample_torus_fused as fused_fn)
            else:
                from cliffordtpu.kernels.sampler_pallas import (
                    sample_torus_fused_keyed as fused_fn)

            fused = fused_fn(key, loc, kappa)
            if fused is not None:
                return fused
        shape = tuple(sample_shape) + loc.shape
        k_u, k_v = jax.random.split(key)
        nu = 2.0 * (kappa + _PS_EPS) + 1.0  # matches alpha = k + 1/2 + eps
        u = jax.random.uniform(k_u, shape, dtype=jnp.float32, minval=1e-12)
        v = jax.random.uniform(k_v, shape, dtype=jnp.float32)
        # expm1 keeps precision at large kappa where U^(-2/nu) -> 1
        w = jnp.expm1((-2.0 / nu) * jnp.log(u))
        theta = loc + 2.0 * jnp.arctan(
            jnp.cos((2.0 * jnp.pi) * v) * jnp.sqrt(w)).astype(loc.dtype)
        return angles_to_torus(theta)

    rsample = sample

    def log_prob(self, value):
        """``dists/clifford.py:310-316`` — note: sums ALL d circles."""
        loc, kappa = self._params()
        angles = torus_to_angles(value)
        vecs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], -1)
        ps = self._circle_ps(loc, kappa)
        return ps.log_prob(vecs).sum(-1)

    def entropy(self):
        """``dists/clifford.py:318-322`` — sums circles 1..d-1."""
        loc, kappa = self._params()
        ps = self._circle_ps(loc, kappa)
        return ps.entropy()[..., 1:].sum(-1)
