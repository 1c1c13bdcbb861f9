"""Modified-Bessel helpers for von Mises / vMF distributions (pure JAX).

TPU-native replacement for the reference's scipy round-trip
(``vmf/hyperspherical_vae/ops/ive.py:7-46`` moves tensors to CPU NumPy and
calls ``scipy.special.ive``): here ``log_ive`` is an on-device log-space power
series, exact to float32 precision in the concentration regime the encoders
produce (kappa is clamped to <= 10 everywhere, see ``mnist/mlp_vae.py:66``),
and auto-differentiable so no custom backward rule is needed.

Also provides the Bessel-ratio bounds of the reference
(``ops/ive.py:57-79``, arXiv:1606.02008 / arXiv:1902.02603) and the
von Mises entropy used by the Clifford torus distribution
(``dists/clifford.py:21-31``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln, logsumexp

# Number of power-series terms.  For z <= 32 and orders up to ~130 the series
# I_v(z) = sum_k (z/2)^(2k+v) / (k! Gamma(k+v+1)) converges to float32 machine
# precision well within 64 terms (term ratio ~ (z/2)^2 / (k (k+v))).
_SERIES_TERMS = 64


def log_iv_series(v, z, n_terms: int = _SERIES_TERMS):
    """log I_v(z) via a log-space power series (stable, differentiable).

    Valid for v >= 0, z >= 0, accurate for z up to ~30 in float32.
    """
    v = jnp.asarray(v, dtype=jnp.float32)
    z = jnp.asarray(z, dtype=jnp.float32)
    v, z = jnp.broadcast_arrays(v, z)
    # guard z=0: log(z/2) -> -inf handled by where
    safe_z = jnp.maximum(z, 1e-30)
    log_half_z = jnp.log(safe_z / 2.0)
    k = jnp.arange(n_terms, dtype=jnp.float32)
    # terms: (2k+v) log(z/2) - lgamma(k+1) - lgamma(k+v+1)
    terms = (
        (2.0 * k + v[..., None]) * log_half_z[..., None]
        - gammaln(k + 1.0)
        - gammaln(k + v[..., None] + 1.0)
    )
    out = logsumexp(terms, axis=-1)
    # at z == 0: I_v(0) = 1 if v == 0 else 0
    zero_val = jnp.where(v == 0, 0.0, -jnp.inf)
    return jnp.where(z == 0, zero_val, out)


def log_ive(v, z):
    """log( I_v(z) * exp(-z) ) — exponentially-scaled modified Bessel.

    Drop-in for ``log(ive(v, z))`` of the reference (``ops/ive.py:46``).
    """
    return log_iv_series(v, z) - jnp.asarray(z, jnp.float32)


def ive(v, z):
    """Exponentially-scaled modified Bessel of the first kind I_v(z) e^{-z}."""
    return jnp.exp(log_ive(v, z))


def ive_fraction_approx(v, z):
    """Lower bound on I_{v}(z) / I_{v-1}(z) (arXiv:1606.02008).

    Mirrors ``ops/ive.py:57-59``.
    """
    return z / (v - 1 + jnp.sqrt((v + 1) ** 2 + z**2))


def ive_fraction_approx2(v, z, eps: float = 1e-20):
    """Tight two-sided bound on I_v(z)/I_{v-1}(z) (arXiv:1902.02603).

    Mirrors ``ops/ive.py:63-79`` including the 1e-20 clamps.
    """

    def delta_a(a):
        lamb = v + (a - 1.0) / 2.0
        return (v - 0.5) + lamb / (
            2 * jnp.sqrt(jnp.clip(lamb**2 + z**2, min=eps))
        )

    delta_0 = delta_a(0.0)
    delta_2 = delta_a(2.0)
    b_0 = z / jnp.clip(delta_0 + jnp.sqrt(delta_0**2 + z**2), min=eps)
    b_2 = z / jnp.clip(delta_2 + jnp.sqrt(delta_2**2 + z**2), min=eps)
    return (b_0 + b_2) / 2.0


def von_mises_entropy(kappa):
    """H[vM(kappa)] = log(2 pi I0(kappa)) - kappa I1(kappa)/I0(kappa).

    Exactly the stabilized i0e/i1e form of ``dists/clifford.py:21-31``
    (same 1e-7 epsilon inside the logs).
    """
    eps = jnp.asarray(1e-7, dtype=kappa.dtype)
    log_i0 = jnp.log(jax.scipy.special.i0e(kappa) + eps) + kappa
    log_i1 = jnp.log(jax.scipy.special.i1e(kappa) + eps) + kappa
    ratio_i1_i0 = jnp.exp(log_i1 - log_i0)
    return math.log(2 * math.pi) + log_i0 - kappa * ratio_i1_i0
