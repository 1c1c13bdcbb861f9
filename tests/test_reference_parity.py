"""Numerical parity vs the PyTorch reference (read-only at /root/reference).

These tests run the reference's distributions on CPU with identical inputs
and assert our JAX implementations agree to float32 tolerance.  Skipped
automatically when the reference checkout is absent.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "vmf"))
    import torch

    torch.manual_seed(0)
    from dists.clifford import (  # noqa: E402
        CliffordPowerSphericalDistribution as TorchCliffordPS,
        CliffordTorusUniform as TorchCliffordUniform,
        HypersphericalUniform as TorchHSUniform,
        PowerSpherical as TorchPS,
        _von_mises_entropy,
    )

from cliffordtpu.distributions import (
    CliffordPowerSphericalDistribution,
    CliffordTorusUniform,
    HypersphericalUniform,
    PowerSpherical,
)
from cliffordtpu.distributions.bessel import von_mises_entropy
from cliffordtpu.ops.torus import angles_to_torus, torus_to_angles


def _np(x):
    return x.detach().cpu().numpy()


def test_power_spherical_parity():
    rng = np.random.default_rng(0)
    for d in [2, 3, 8, 33]:
        loc = rng.normal(size=(5, d)).astype(np.float32)
        loc /= np.linalg.norm(loc, axis=-1, keepdims=True)
        kappa = rng.uniform(0.1, 10.0, size=(5,)).astype(np.float32)
        value = rng.normal(size=(5, d)).astype(np.float32)
        value /= np.linalg.norm(value, axis=-1, keepdims=True)

        t_ps = TorchPS(torch.tensor(loc), torch.tensor(kappa))
        j_ps = PowerSpherical(jnp.asarray(loc), jnp.asarray(kappa))

        np.testing.assert_allclose(
            np.asarray(j_ps.log_normalizer()),
            _np(t_ps.log_normalizer()),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(j_ps.log_prob(jnp.asarray(value))),
            _np(t_ps.log_prob(torch.tensor(value))),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(j_ps.entropy()),
            _np(t_ps.entropy()),
            rtol=1e-5, atol=1e-5,
        )


def test_hyperspherical_uniform_parity():
    for dim in [2, 3, 10, 41]:
        t_u = TorchHSUniform(dim)
        j_u = HypersphericalUniform(dim)
        x = np.random.default_rng(1).normal(size=(3, dim)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(j_u.log_prob(jnp.asarray(x))),
            _np(t_u.log_prob(torch.tensor(x))),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(j_u.entropy()), float(_np(t_u.entropy())), rtol=1e-6
        )


def test_clifford_uniform_parity():
    for d in [2, 5, 20]:
        t_u = TorchCliffordUniform(d)
        j_u = CliffordTorusUniform(d)
        np.testing.assert_allclose(
            float(j_u.entropy()), float(t_u.entropy()), rtol=1e-6
        )


def test_torus_embedding_parity():
    """Our real-DFT matmul == the reference's Hermitian iFFT embedding."""
    rng = np.random.default_rng(2)
    for d in [2, 4, 7, 32]:
        angles = rng.uniform(0, 2 * np.pi, size=(6, d)).astype(np.float32)
        # reference embedding (dists/clifford.py:301-308)
        n = 2 * d
        theta_s = np.zeros((6, n), np.float32)
        theta_s[:, 1:d] = angles[:, 1:]
        theta_s[:, -d + 1:] = -angles[:, 1:][:, ::-1]
        ref = np.fft.ifft(np.exp(1j * theta_s), axis=-1).real.astype(np.float32)
        ours = np.asarray(angles_to_torus(jnp.asarray(angles)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_clifford_ps_parity():
    rng = np.random.default_rng(3)
    for d in [2, 4, 16]:
        loc = rng.uniform(0, 2 * np.pi, size=(4, d)).astype(np.float32)
        kappa = rng.uniform(0.1, 9.0, size=(4, d)).astype(np.float32)
        t_q = TorchCliffordPS(torch.tensor(loc), torch.tensor(kappa))
        j_q = CliffordPowerSphericalDistribution(
            jnp.asarray(loc), jnp.asarray(kappa)
        )
        np.testing.assert_allclose(
            np.asarray(j_q.entropy()), _np(t_q.entropy()), rtol=1e-4, atol=1e-4
        )
        # log_prob on actual torus samples from the torch implementation
        with torch.no_grad():
            z = t_q.rsample()
        np.testing.assert_allclose(
            np.asarray(j_q.log_prob(jnp.asarray(_np(z)))),
            _np(t_q.log_prob(z)),
            rtol=1e-3, atol=1e-3,
        )


def test_torus_to_angles_parity():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(5, 32)).astype(np.float32)
    ref = np.angle(np.fft.fft(x, axis=-1)[..., :16])
    ours = np.asarray(torus_to_angles(jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_von_mises_entropy_parity():
    kappa = np.linspace(0.03, 10.0, 17).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(von_mises_entropy(jnp.asarray(kappa))),
        _np(_von_mises_entropy(torch.tensor(kappa))),
        rtol=1e-5, atol=1e-5,
    )


def test_vmf_parity():
    sys.path.insert(0, os.path.join(REF, "vmf"))
    from hyperspherical_vae.distributions import VonMisesFisher as TorchVMF
    from hyperspherical_vae.distributions.hyperspherical_uniform import (
        HypersphericalUniform as TorchVMFUniform,
    )

    from cliffordtpu.distributions import (
        VMFHypersphericalUniform,
        VonMisesFisher,
    )

    rng = np.random.default_rng(5)
    for m in [3, 5, 21]:
        loc = rng.normal(size=(4, m)).astype(np.float32)
        loc /= np.linalg.norm(loc, axis=-1, keepdims=True)
        kappa = rng.uniform(0.5, 10.0, size=(4, 1)).astype(np.float32)
        t_q = TorchVMF(torch.tensor(loc), torch.tensor(kappa))
        j_q = VonMisesFisher(jnp.asarray(loc), jnp.asarray(kappa))

        np.testing.assert_allclose(
            np.asarray(j_q.entropy()), _np(t_q.entropy()), rtol=1e-4, atol=1e-4
        )
        x = rng.normal(size=(4, m)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(j_q.log_prob(jnp.asarray(x))),
            _np(t_q.log_prob(torch.tensor(x))),
            rtol=1e-4, atol=1e-4,
        )

        t_u = TorchVMFUniform(m - 1, device="cpu")
        j_u = VMFHypersphericalUniform(m - 1)
        np.testing.assert_allclose(
            float(j_u.entropy()), float(_np(t_u.entropy())), rtol=1e-5
        )
