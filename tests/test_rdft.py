"""Parity tests: the real-DFT matmul VSA backend vs the complex-FFT one.

``CLIFFORDTPU_VSA_FFT=matmul`` is what TPU's auto mode selects
(``vsa/rdft.py``); these tests force it on CPU and require agreement
with the exact ``rfft`` path well inside the f32 matmul rounding bound.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.vsa import ops, rdft


@pytest.mark.parametrize("d", [8, 17, 64, 257, 1024])
def test_rfft_pair_matches_jnp(d):
    x = jax.random.normal(jax.random.PRNGKey(0), (5, d))
    re, im = rdft.rfft_pair(x)
    want = jnp.fft.rfft(x, axis=-1)
    np.testing.assert_allclose(re, want.real, atol=2e-4 * np.sqrt(d))
    np.testing.assert_allclose(im, want.imag, atol=2e-4 * np.sqrt(d))


@pytest.mark.parametrize("d", [8, 17, 64, 257, 1024])
def test_irfft_pair_roundtrip(d):
    x = jax.random.normal(jax.random.PRNGKey(1), (5, d))
    re, im = rdft.rfft_pair(x)
    back = rdft.irfft_pair(re, im, d)
    np.testing.assert_allclose(back, x, atol=5e-5 * np.sqrt(d))


@pytest.mark.parametrize("d", [64, 255, 1024])
def test_bind_matmul_matches_fft(d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    a = jax.random.normal(k1, (7, d)) / np.sqrt(d)
    b = jax.random.normal(k2, (7, d)) / np.sqrt(d)
    np.testing.assert_allclose(
        rdft.bind_matmul(a, b), ops.bind(a, b), atol=1e-5)


@pytest.mark.parametrize("d", [64, 255, 1024])
def test_unbind_deconv_matmul_matches_fft(d):
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    # unitary b keeps the deconv well-conditioned, as in the battery
    b = ops.unitary_init(k1, 7, d)
    a = jax.random.normal(k2, (7, d)) / np.sqrt(d)
    ab = ops.bind(a, b)
    np.testing.assert_allclose(
        rdft.unbind_deconv_matmul(ab, b),
        ops.unbind(ab, b, method="deconv"),
        atol=2e-5,
    )


@pytest.mark.parametrize("d", [16, 17, 64, 255])
def test_unitary_init_matmul_matches_fft(d):
    key = jax.random.PRNGKey(4)
    want = ops.unitary_init(key, 9, d)  # CPU auto -> fft
    phi_based = None
    # same key -> same phases -> matmul body must reproduce the vectors
    import math

    k_a, k_s = jax.random.split(key)
    n_phases = (d - 1) // 2
    aa = jax.random.uniform(k_a, (9, n_phases))
    sign = jnp.sign(jax.random.uniform(k_s, (9, n_phases)) - 0.5)
    phi = sign * math.pi * (1e-3 + aa * (1 - 2e-3))
    got = rdft.unitary_from_phases(phi, d)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_env_override_selects_backend(monkeypatch):
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "matmul")
    assert rdft.method(64) == "matmul"
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "fft")
    assert rdft.method(64) == "fft"
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "auto")
    # tests run on CPU -> auto resolves to fft
    assert rdft.method(64) == "fft"


def test_auto_respects_default_device_pin(monkeypatch):
    """auto must key on the device the op will EXECUTE on: the runners'
    in-process eval fallback pins jax.default_device(cpu) inside a TPU
    process, where default_backend() still says 'tpu' — that pin must
    get the CPU decision (exact rfft, not 1-core O(d^2) matmuls)."""
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "auto")
    monkeypatch.setattr(rdft.jax, "default_backend", lambda: "tpu")
    assert rdft.method(64) == "matmul"  # simulated TPU process
    with jax.default_device(jax.devices("cpu")[0]):
        assert rdft.method(64) == "fft"  # CPU pin wins over the backend
    assert rdft.method(64) == "matmul"  # pin scope ended


def test_matmul_backend_safe_under_jit(monkeypatch):
    """Regression: the round-4 TPU battery died with UnexpectedTracerError
    because the basis builders lru_cached tracers created inside the first
    enclosing jit.  Bases are now generated in-trace; re-tracing and eager
    reuse after a jit call must both work under jax.checking_leaks."""
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "matmul")
    d = 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(6))
    a = jax.random.normal(k1, (3, d)) / np.sqrt(d)
    b = ops.unitary_init(k2, 3, d)
    with jax.checking_leaks():
        bound = jax.jit(ops.bind)(a, b)  # first trace builds the bases
    eager = ops.bind(a, b)  # eager call after the jit trace
    np.testing.assert_allclose(bound, eager, atol=1e-6)
    rec = jax.jit(lambda x, y: ops.unbind(x, y, method="deconv"))(bound, b)
    np.testing.assert_allclose(rec, a, atol=1e-4)


def test_ops_dispatch_matmul_backend(monkeypatch):
    """bind/unbind/unitary_init honor the env switch end-to-end."""
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "matmul")
    d = 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    b = ops.unitary_init(k1, 4, d)
    a = jax.random.normal(k2, (4, d)) / np.sqrt(d)
    ab = ops.bind(a, b)
    rec_inv = ops.unbind(ab, b, method="inv")
    rec_dag = ops.unbind(ab, b, method="deconv")
    # unitary roles: exact recovery up to matmul rounding
    np.testing.assert_allclose(rec_inv, a, atol=1e-4)
    np.testing.assert_allclose(rec_dag, a, atol=1e-4)
    monkeypatch.setenv("CLIFFORDTPU_VSA_FFT", "fft")
    np.testing.assert_allclose(ops.bind(a, b), ab, atol=1e-5)
