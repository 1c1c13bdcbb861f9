"""Tests for the Clifford-torus real-DFT embedding vs the FFT definition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.ops.torus import (
    angles_to_torus,
    torus_to_angles,
    wrap_angle,
)


@pytest.mark.parametrize("d", [2, 3, 5, 16, 128])
def test_matmul_matches_fft(d):
    key = jax.random.PRNGKey(0)
    angles = jax.random.uniform(key, (7, d)) * 2 * np.pi
    x_mm = angles_to_torus(angles, method="matmul")
    x_fft = angles_to_torus(angles, method="fft")
    np.testing.assert_allclose(np.asarray(x_mm), np.asarray(x_fft), atol=1e-5)


@pytest.mark.parametrize("d", [2, 5, 64])
def test_unit_norm(d):
    """Parseval: the embedding lands on the unit sphere in R^{2d}."""
    key = jax.random.PRNGKey(1)
    angles = jax.random.uniform(key, (11, d)) * 2 * np.pi
    x = angles_to_torus(angles)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-5
    )


@pytest.mark.parametrize("d", [3, 10, 40])
def test_round_trip(d):
    """torus_to_angles recovers the free angles (index 0 pinned to 0)."""
    key = jax.random.PRNGKey(2)
    angles = jax.random.uniform(key, (5, d), minval=-np.pi, maxval=np.pi)
    x = angles_to_torus(angles)
    rec = torus_to_angles(x)
    # index 0 is pinned: recovered angle 0 is the phase of sum(x) which is 0
    np.testing.assert_allclose(
        np.asarray(wrap_angle(rec[..., 1:])),
        np.asarray(wrap_angle(angles[..., 1:])),
        atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(rec[..., 0]), 0.0, atol=1e-4)


def test_inverse_matmul_matches_fft():
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (4, 64))
    a_mm = torus_to_angles(x, method="matmul")
    a_fft = torus_to_angles(x, method="fft")
    np.testing.assert_allclose(np.asarray(a_mm), np.asarray(a_fft), atol=1e-4)


def test_gradients_flow():
    d = 8

    def loss(angles):
        return jnp.sum(angles_to_torus(angles) ** 2)

    g = jax.grad(loss)(jnp.linspace(0.1, 1.0, d))
    assert np.all(np.isfinite(np.asarray(g)))
    # angle 0 is pinned -> zero gradient there, nonzero elsewhere
    assert abs(float(g[0])) < 1e-6
    assert np.any(np.abs(np.asarray(g[1:])) > 1e-8)


def test_device_bases_match_host_constants():
    """Above HOST_CONST_MAX_DIM the DFT bases are generated on device
    (iota + int32 mod + cos) instead of host-constant literals; the two
    constructions must agree to f32 rounding at every dim, including ones
    past f32's exact-integer range for k*j (d=4096: k*j up to 33.5M)."""
    from cliffordtpu.ops.torus import (
        _fft_bases,
        _fft_bases_device,
        _torus_bases,
        _torus_bases_device,
    )

    for d in (16, 600, 4096):
        cos_h, sin_h, const_h = _torus_bases(d)
        cos_d, sin_d, const_d = _torus_bases_device(d, jnp.float32)
        np.testing.assert_allclose(np.asarray(cos_d), cos_h, atol=3e-7)
        np.testing.assert_allclose(np.asarray(sin_d), sin_h, atol=3e-7)
        np.testing.assert_allclose(np.asarray(const_d), const_h, atol=3e-7)
        icos_h, isin_h = _fft_bases(d)
        icos_d, isin_d = _fft_bases_device(d, jnp.float32)
        np.testing.assert_allclose(np.asarray(icos_d), icos_h, atol=2e-6)
        np.testing.assert_allclose(np.asarray(isin_d), isin_h, atol=2e-6)


def test_large_dim_roundtrip_uses_device_bases():
    """d=600 (> HOST_CONST_MAX_DIM) must round-trip through the
    device-generated bases exactly like the small-dim path."""
    key = jax.random.PRNGKey(11)
    angles = jax.random.uniform(key, (3, 600), minval=-3.0, maxval=3.0)
    x = angles_to_torus(angles)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-4)
    rec = torus_to_angles(x)
    np.testing.assert_allclose(
        np.asarray(wrap_angle(rec[..., 1:])),
        np.asarray(wrap_angle(angles[..., 1:])),
        atol=1e-3,
    )
