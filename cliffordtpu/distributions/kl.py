"""KL-divergence registry — JAX analogue of ``torch.distributions.kl``.

The reference registers three entropy-based KLs against uniform priors
(``dists/clifford.py:325-337``) plus the vMF one
(``von_mises_fisher.py:215-217``); all have the form
``KL(q || uniform) = -H[q] + H[uniform]``.  Here ``kl_divergence(q, p)``
dispatches on the (type(q), type(p)) pair, and new pairs can be registered
with the ``@register_kl`` decorator just like torch.
"""

from __future__ import annotations

from cliffordtpu.distributions.clifford_torus import (
    CliffordPowerSphericalDistribution,
    CliffordTorusDistribution,
)
from cliffordtpu.distributions.normal import Normal, kl_normal_normal
from cliffordtpu.distributions.power_spherical import PowerSpherical
from cliffordtpu.distributions.uniforms import (
    CliffordTorusUniform,
    HypersphericalUniform,
    VMFHypersphericalUniform,
)
from cliffordtpu.distributions.von_mises_fisher import VonMisesFisher

_KL_REGISTRY = {}


def register_kl(type_q, type_p):
    def decorator(fn):
        _KL_REGISTRY[(type_q, type_p)] = fn
        return fn

    return decorator


def kl_divergence(q, p):
    fn = _KL_REGISTRY.get((type(q), type(p)))
    if fn is None:
        raise NotImplementedError(
            f"No KL registered for ({type(q).__name__}, {type(p).__name__})"
        )
    return fn(q, p)


def _neg_entropy_plus_uniform(q, p):
    return -q.entropy() + p.entropy()


register_kl(CliffordPowerSphericalDistribution, CliffordTorusUniform)(
    _neg_entropy_plus_uniform
)  # dists/clifford.py:325-327
register_kl(CliffordTorusDistribution, CliffordTorusUniform)(
    _neg_entropy_plus_uniform
)  # dists/clifford.py:330-332
register_kl(PowerSpherical, HypersphericalUniform)(
    _neg_entropy_plus_uniform
)  # dists/clifford.py:335-337
register_kl(VonMisesFisher, VMFHypersphericalUniform)(
    _neg_entropy_plus_uniform
)  # von_mises_fisher.py:215-217
register_kl(Normal, Normal)(kl_normal_normal)
