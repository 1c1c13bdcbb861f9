"""Core HRR binding/bundling primitives (``utils/vsa.py:9-96``).

The FFT-backed ops (``bind``/``unbind``/``unitary_init``) have two
numerically-equivalent backends selected per call by
:func:`cliffordtpu.vsa.rdft.method` (env ``CLIFFORDTPU_VSA_FFT``):
complex ``rfft`` (exact parity path, default on CPU) and a real-DFT
matmul pair (default on TPU — MXU-friendly and free of complex dtypes,
which the axon backend sporadically rejects; see ``rdft.py``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from cliffordtpu.vsa import rdft


def hrr_init(key, n: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """n random item vectors ~ N(0, 1/sqrt(d)) (``utils/vsa.py:9-12``)."""
    return jax.random.normal(key, (n, d), dtype=dtype) / math.sqrt(d)


def unitary_init(key, n: int, d: int, eps: float = 1e-3, dtype=jnp.float32):
    """n vectors with unit Fourier magnitude (``utils/vsa.py:16-36``).

    Random phases phi in +-pi*(eps, 1-eps), Hermitian-symmetric spectrum,
    inverse FFT.  Vectorized over n (the reference loops in Python).
    """
    k_a, k_s = jax.random.split(key)
    n_phases = (d - 1) // 2
    a = jax.random.uniform(k_a, (n, n_phases))
    sign = jnp.sign(jax.random.uniform(k_s, (n, n_phases)) - 0.5)
    phi = sign * math.pi * (eps + a * (1 - 2 * eps))

    if rdft.method(d) == "matmul":
        return rdft.unitary_from_phases(phi, d, dtype=dtype)

    # build the real rfft half-spectrum: bin 0 = 1, bins 1..(d-1)//2 = e^{i phi},
    # Nyquist bin (even d) = 1.
    n_bins = d // 2 + 1
    spec = jnp.ones((n, n_bins), dtype=jnp.complex64)
    spec = spec.at[:, 1 : n_phases + 1].set(
        jnp.cos(phi) + 1j * jnp.sin(phi)
    )
    return jnp.fft.irfft(spec, n=d, axis=-1).astype(dtype)


def normalize_vectors(x: jnp.ndarray) -> jnp.ndarray:
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=1e-12)


def bind(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """HRR binding = circular convolution via real FFT (``utils/vsa.py:43-46``)."""
    n = a.shape[-1]
    if rdft.method(n) == "matmul":
        return rdft.bind_matmul(a, b)
    fa = jnp.fft.rfft(a, axis=-1)
    fb = jnp.fft.rfft(b, axis=-1)
    return jnp.fft.irfft(fa * fb, n=n, axis=-1)


def invert(a: jnp.ndarray) -> jnp.ndarray:
    """Involution [a0, a_{n-1}, ..., a1] (``utils/vsa.py:49-53``)."""
    head = a[..., :1]
    tail = a[..., 1:]
    return jnp.concatenate([head, jnp.flip(tail, axis=-1)], axis=-1)


def unbind(ab: jnp.ndarray, b: jnp.ndarray, method: str = "inv") -> jnp.ndarray:
    """Unbind (``utils/vsa.py:56-72``).

    * "inv"/"*":      x = (ab) (*) b^{-1}
    * "†"/"deconv":   x = irfft( rfft(ab) / (rfft(b) + 1e-12) )
    """
    if method in ("inv", "*"):
        return bind(ab, invert(b))
    elif method in ("†", "deconv", "dagger"):
        n = ab.shape[-1]
        if rdft.method(n) == "matmul":
            return rdft.unbind_deconv_matmul(ab, b)
        fab = jnp.fft.rfft(ab, axis=-1)
        fb = jnp.fft.rfft(b, axis=-1)
        return jnp.fft.irfft(fab / (fb + 1e-12), n=n, axis=-1)
    raise ValueError(f"unsupported unbind method: {method}")


def bundle(vectors: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Superposition: sum over axis 0, / sqrt(k) (``utils/vsa.py:75-79``)."""
    s = jnp.sum(vectors, axis=0)
    if normalize:
        s = s / math.sqrt(vectors.shape[0])
    return s


def permute_vector(v: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Braiding permutation (``utils/vsa.py:82-84``)."""
    return v[..., perm]


def unpermute_vector(v: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Inverse braiding via argsort (``utils/vsa.py:87-90``)."""
    return v[..., jnp.argsort(perm)]


def similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity along the last axis (``utils/vsa.py:93-96``)."""
    a_n = a / jnp.clip(jnp.linalg.norm(a, axis=-1, keepdims=True), min=1e-8)
    b_n = b / jnp.clip(jnp.linalg.norm(b, axis=-1, keepdims=True), min=1e-8)
    return jnp.sum(a_n * b_n, axis=-1)
