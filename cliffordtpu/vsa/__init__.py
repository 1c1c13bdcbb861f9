"""Fourier HRR / VSA operations (L3a) — jitted, vmap-friendly.

Rebuild of ``utils/vsa.py:9-96``: binding is circular convolution done in the
Fourier domain.  On TPU we use the *real* FFT (``jnp.fft.rfft``/``irfft``)
instead of the reference's complex FFT pair — half the spectrum, same result
for real inputs — and all capacity experiments (in ``vsa.capacity``) are
vmapped over trials instead of Python loops.
"""

from cliffordtpu.vsa.ops import (
    bind,
    bundle,
    hrr_init,
    invert,
    normalize_vectors,
    permute_vector,
    similarity,
    unbind,
    unitary_init,
    unpermute_vector,
)

__all__ = [
    "bind",
    "bundle",
    "hrr_init",
    "invert",
    "normalize_vectors",
    "permute_vector",
    "similarity",
    "unbind",
    "unitary_init",
    "unpermute_vector",
]
