"""Clifford-torus embedding as an exact real DFT — TPU-first design.

The reference embeds d phase angles onto the Clifford torus in R^{2d} by
building a Hermitian-symmetric phase spectrum and taking a complex iFFT
(``dists/clifford.py:301-308``, ``utils/wandb_utils.py:506-521``):

    theta_s = [0, th_1..th_{d-1}, 0, -th_{d-1}..-th_1]   (length n = 2d)
    x = ifft(exp(i * theta_s)).real

Because the spectrum is Hermitian by construction, the output is an exact
*real* transform of (cos th, sin th):

    x_j = (1/n) [ 1 + (-1)^j + 2 * sum_{k=1}^{d-1} cos(th_k + 2 pi j k / n) ]
        = c_j + cos(th)_{1:} @ C  +  sin(th)_{1:} @ S

with C[k, j] =  (2/n) cos(2 pi j k / n),  S[k, j] = -(2/n) sin(2 pi j k / n),
c_j = (1 + (-1)^j)/n.  On TPU this is two MXU matmuls instead of a complex
FFT — exact, differentiable, and fast for every latent dim the framework uses
(d <= 4096).  A ``jnp.fft`` fallback is kept for larger dims.

The inverse (used by ``CliffordPowerSpherical.log_prob``,
``dists/clifford.py:310-312``) recovers angles as
``angle(fft(x)[..., :d])``, which is likewise two real matmuls + atan2 here.

Properties preserved from the reference:
  * angle index 0 is pinned to phase 0 (only d-1 angles are free),
  * outputs have unit L2 norm (Parseval),
  * ``torus_to_angles(angles_to_torus(th))[..., 1:] == wrap(th[..., 1:])``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# Above this latent dim the O(d^2) basis matmul is replaced by jnp.fft.
# 4096 -> two 4095x8192 f32 bases (~268 MB total), still comfortably in HBM.
MATMUL_MAX_DIM = 4096
# smallest d at which the fused Pallas kernel is the measured in-step win
# on TPU (BASELINE.md round 3); below it XLA fusion at tiny shapes wins
PALLAS_MIN_DIM = 2048

# Above this dim the bases are generated on device (iota + cos) instead of
# being embedded as host-constant literals: at d=512 the pair of bases is
# ~8 MB of HLO; at d=4096 it is ~268 MB, which overflows the remote-compile
# request limit on tunneled TPU backends (HTTP 413).
HOST_CONST_MAX_DIM = 512


@functools.lru_cache(maxsize=32)
def _torus_bases(d: int):
    """(cos basis, sin basis, const) for the d-angle -> 2d-dim embedding."""
    n = 2 * d
    k = np.arange(1, d, dtype=np.float64)  # free angle indices 1..d-1
    j = np.arange(n, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(k, j) / n  # (d-1, n)
    cos_b = (2.0 / n) * np.cos(phase)
    sin_b = -(2.0 / n) * np.sin(phase)
    const = (1.0 + np.cos(np.pi * j)) / n  # (1 + (-1)^j)/n
    return (
        cos_b.astype(np.float32),
        sin_b.astype(np.float32),
        const.astype(np.float32),
    )


def _torus_bases_device(d: int, dtype):
    """On-device construction of the embedding bases (iota + cos/sin).

    For large d the host-constant bases would be baked into the HLO as
    literals — at d=4096 that is ~268 MB of program, which overflows the
    remote-compile request limit (HTTP 413) on tunneled TPU backends.
    Generated on device the program carries only iotas.  The phase
    ``2*pi*k*j/n`` is reduced mod n in int32 BEFORE the float multiply:
    k*j reaches 33.5M at d=4096, beyond f32's exact-integer range, while
    (k*j) % n < 2d is always exact.
    """
    n = 2 * d
    k = jnp.arange(1, d, dtype=jnp.int32)
    j = jnp.arange(n, dtype=jnp.int32)
    kj = (k[:, None] * j[None, :]) % n  # (d-1, n), exact in int32
    phase = kj.astype(jnp.float32) * jnp.float32(2.0 * np.pi / n)
    cos_b = (2.0 / n) * jnp.cos(phase)
    sin_b = -(2.0 / n) * jnp.sin(phase)
    const = (1.0 + jnp.cos(jnp.pi * j.astype(jnp.float32))) / n
    return cos_b.astype(dtype), sin_b.astype(dtype), const.astype(dtype)


def _fft_bases_device(d: int, dtype):
    """On-device inverse-transform bases; see ``_torus_bases_device``."""
    n = 2 * d
    j = jnp.arange(n, dtype=jnp.int32)
    k = jnp.arange(d, dtype=jnp.int32)
    jk = (j[:, None] * k[None, :]) % n  # (n, d), exact in int32
    phase = jk.astype(jnp.float32) * jnp.float32(2.0 * np.pi / n)
    return jnp.cos(phase).astype(dtype), (-jnp.sin(phase)).astype(dtype)


@functools.lru_cache(maxsize=32)
def _fft_bases(d: int):
    """(cos basis, sin basis) for the 2d-dim -> d-angle inverse transform."""
    n = 2 * d
    j = np.arange(n, dtype=np.float64)
    k = np.arange(d, dtype=np.float64)
    phase = 2.0 * np.pi * np.outer(j, k) / n  # (n, d)
    return (
        np.cos(phase).astype(np.float32),
        -np.sin(phase).astype(np.float32),
    )


def angles_to_torus(angles: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """Embed d angles (..., d) onto the Clifford torus in R^{2d}.

    Angle index 0 is ignored (pinned to phase 0), matching
    ``dists/clifford.py:301-306``.  ``method`` in {"auto", "matmul", "fft"}.
    """
    d = angles.shape[-1]
    if method == "auto":
        # Default decided by END-TO-END measurement (BASELINE.md "Pallas
        # fused torus" studies, rounds 1-3):
        # * d >= PALLAS_MIN_DIM on TPU -> the fused Pallas kernel.  With
        #   the round-3 kernel (in-kernel basis generation, masked
        #   padding) it beats the XLA matmul path INSIDE the cnn4096
        #   train step in every paired run (best-window 168.7/165.6/138.6
        #   vs 144.1/143.8/112.5 steps/s on v5e, ~+16%), reversing the
        #   round-2 verdict for the old kernel.
        # * small d -> XLA matmul: the torus embed is a negligible slice
        #   of those steps (flagship32 sampler = 0.2%) and XLA's fusion
        #   with the surrounding sampler ops wins at tiny shapes.
        # * d > MATMUL_MAX_DIM -> FFT (VMEM-bounded kernel and 2d-wide
        #   bases both stop scaling past 4096).
        # CLIFFORDTPU_TORUS_METHOD overrides globally (matmul gives the
        # pure-XLA parity path; pallas differs from it by <3e-8).
        method = os.environ.get("CLIFFORDTPU_TORUS_METHOD")
        if not method:
            if (PALLAS_MIN_DIM <= d <= MATMUL_MAX_DIM
                    and jax.default_backend() == "tpu"):
                method = "pallas"
            else:
                method = "matmul" if d <= MATMUL_MAX_DIM else "fft"
    if method == "pallas":
        # fused cos/sin + dual-matmul TPU kernel (falls back off-TPU)
        from cliffordtpu.kernels.torus_pallas import angles_to_torus_fused

        return angles_to_torus_fused(angles)
    if method == "matmul":
        dtype = angles.dtype
        if d > HOST_CONST_MAX_DIM:
            cos_b, sin_b, const = _torus_bases_device(d, dtype)
        else:
            np_cos, np_sin, np_const = _torus_bases(d)
            cos_b = jnp.asarray(np_cos, dtype)
            sin_b = jnp.asarray(np_sin, dtype)
            const = jnp.asarray(np_const, dtype)
        th = angles[..., 1:]
        x = jnp.cos(th) @ cos_b + jnp.sin(th) @ sin_b + const
        return x
    # FFT fallback: build the Hermitian spectrum explicitly like the reference.
    n = 2 * d
    th = angles[..., 1:]
    zeros = jnp.zeros(angles.shape[:-1] + (1,), angles.dtype)
    theta_s = jnp.concatenate(
        [zeros, th, zeros, -jnp.flip(th, axis=-1)], axis=-1
    )
    assert theta_s.shape[-1] == n
    spectrum = jnp.exp(1j * theta_s.astype(jnp.complex64))
    return jnp.fft.ifft(spectrum, axis=-1).real.astype(angles.dtype)


def torus_to_angles(x: jnp.ndarray, method: str = "auto") -> jnp.ndarray:
    """Recover d phase angles from a torus point (..., 2d) -> (..., d).

    Equals ``angle(fft(x)[..., :d])`` (``dists/clifford.py:311-312``).
    """
    n = x.shape[-1]
    d = n // 2
    if method == "auto":
        method = "matmul" if d <= MATMUL_MAX_DIM else "fft"
    if method == "matmul":
        dtype = x.dtype
        if d > HOST_CONST_MAX_DIM:
            cos_b, sin_b = _fft_bases_device(d, dtype)
        else:
            np_cos, np_sin = _fft_bases(d)
            cos_b = jnp.asarray(np_cos, dtype)
            sin_b = jnp.asarray(np_sin, dtype)
        re = x @ cos_b
        im = x @ sin_b
        return jnp.arctan2(im, re)
    freq = jnp.fft.fft(x.astype(jnp.complex64), axis=-1)[..., :d]
    return jnp.angle(freq).astype(x.dtype)


def wrap_angle(theta: jnp.ndarray) -> jnp.ndarray:
    """Wrap angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
