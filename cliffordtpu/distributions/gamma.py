"""Fixed-budget Gamma sampler: while-free Marsaglia–Tsang, implicit grads.

``jax.random.gamma`` lowers its rejection loop to ``lax.while_loop``; on
TPU the loop plus its carry copies cost ~1.1 ms/step (~6%) of the flagship
train-step profile (BASELINE.md round-2 study), and while-loops serialize
against everything else in the program.  This sampler instead draws a
fixed budget of K proposals and first-accept-selects — statically shaped,
loop-free, fully vectorized, the same design as the vMF sampler
(``von_mises_fisher.py``).

Marsaglia–Tsang (2000) squeeze with the alpha < 1 boost
(z ~ Gamma(alpha+1), z * U^(1/alpha)): per-proposal acceptance is >= ~0.95
for every alpha (minimum near alpha = 1), so K = 6 leaves a miss
probability < 2e-8 per element; the fallback is the last proposal.

Gradient semantics are identical to ``jax.random.gamma``: the sample is an
implicit function of alpha, differentiated with the
``lax.random_gamma_grad`` primitive (dz/dalpha at fixed quantile), so
swapping samplers changes no training gradients beyond the draw itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BUDGET = 6
_TINY = 1e-20


def _gamma_fixed(key, alpha, shape):
    """K-proposal Marsaglia–Tsang; ``alpha`` broadcast to ``shape``."""
    shape = tuple(shape)
    alpha = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), shape)
    boost = alpha < 1.0
    a = jnp.where(boost, alpha + 1.0, alpha)  # boosted shape is always >= 1
    d = a - 1.0 / 3.0
    c = 1.0 / jnp.sqrt(9.0 * d)
    kx, ku, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (_BUDGET,) + shape, dtype=jnp.float32)
    u = jax.random.uniform(ku, (_BUDGET,) + shape, dtype=jnp.float32,
                           minval=_TINY)
    v = (1.0 + c * x) ** 3
    v_pos = v > 0.0
    log_v = jnp.log(jnp.where(v_pos, v, 1.0))
    accept = v_pos & (jnp.log(u) < 0.5 * x * x + d - d * v + d * log_v)
    # first accepted proposal; all-miss (< 2e-8) falls back to the last one
    idx = jnp.argmax(accept, axis=0)
    idx = jnp.where(jnp.any(accept, axis=0), idx, _BUDGET - 1)
    v_sel = jnp.take_along_axis(v, idx[None, ...], axis=0)[0]
    z = d * jnp.maximum(v_sel, _TINY)
    # alpha < 1 boost: Gamma(alpha) = Gamma(alpha+1) * U^(1/alpha)
    u3 = jax.random.uniform(kb, shape, dtype=jnp.float32, minval=_TINY)
    z = jnp.where(boost, z * u3 ** (1.0 / jnp.maximum(alpha, _TINY)), z)
    return z


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 2))
def gamma_sample(key, alpha, shape):
    """Gamma(alpha, 1) of ``shape`` — drop-in for ``jax.random.gamma``
    (same implicit-reparameterization gradients, no while_loop)."""
    return _gamma_fixed(key, jax.lax.stop_gradient(alpha), shape)


@gamma_sample.defjvp
def _gamma_sample_jvp(key, shape, primals, tangents):
    (alpha,) = primals
    (d_alpha,) = tangents
    z = _gamma_fixed(key, jax.lax.stop_gradient(alpha), shape)
    alpha_b = jnp.broadcast_to(jnp.asarray(alpha, jnp.float32), tuple(shape))
    dz_dalpha = jax.lax.random_gamma_grad(alpha_b, z)
    d_alpha_b = jnp.broadcast_to(jnp.asarray(d_alpha, jnp.float32),
                                 tuple(shape))
    return z, dz_dalpha * d_alpha_b
