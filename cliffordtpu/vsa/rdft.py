"""Real-arithmetic DFT for the VSA ops (the MXU path).

HRR binding is circular convolution, which the reference (and our
default path) computes through complex ``rfft``/``irfft``
(``utils/vsa.py:43-72``).  Complex FFT is the one part of the battery
that does NOT map onto the TPU's strengths: XLA lowers it to a generic
complex butterfly on the VPU, and the axon backend additionally throws
sporadic per-op ``UNIMPLEMENTED`` errors on complex-typed programs
(CLAUDE.md; the round-4 TPU eval-battery run died on the battery's very
first complex op, artifacts/bench_r4/chain.log).

Because every input is REAL, the half-spectrum is just two real matrix
products against fixed cosine/sine bases — the same real-DFT trick
``ops/torus.py`` uses for the Clifford embedding, SURVEY §7 step 8(b).
That keeps the whole VSA battery complex-free (axon-safe) and moves its
hot ops onto the MXU.  Exact same math as the FFT path; f32 matmul
rounding bounds the observed difference at ~1e-5 for d <= 4096.

Selection: ``ops.bind``/``unbind``/``unitary_init`` consult
``CLIFFORDTPU_VSA_FFT`` in {auto (default), fft, matmul} — auto picks
matmul on TPU for 2 <= d <= MATMUL_MAX_DIM and complex FFT elsewhere
(CPU FFT is both exact and faster than 1-core matmul).
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

# basis memory is ~8 d^2 bytes across the four cached operands; 4096 caps
# it at ~134 MB HBM, mirroring the torus embedding's MATMUL_MAX_DIM.
MATMUL_MAX_DIM = 4096


def _active_platform() -> str:
    """Platform the op will actually execute on.

    ``jax.default_backend()`` alone is wrong under a
    ``jax.default_device(cpu_dev)`` pin — the runners' in-process eval
    fallback pins exactly that way inside a TPU process, and must get
    the CPU decision (exact rfft, no 1-core O(d^2) matmuls)."""
    dd = getattr(jax.config, "jax_default_device", None)
    if dd is not None:
        # the pin may be a Device object or a string like "cpu"/"cpu:0"
        if isinstance(dd, str):
            return dd.split(":")[0].lower()
        plat = getattr(dd, "platform", None)
        if plat:
            return plat
    return jax.default_backend()


def method(d: int) -> str:
    """Resolve CLIFFORDTPU_VSA_FFT to "fft" | "matmul" for dimension d."""
    m = os.environ.get("CLIFFORDTPU_VSA_FFT", "auto")
    if m == "fft":
        return "fft"
    if m == "matmul":
        return "matmul"
    if (
        _active_platform() not in ("cpu",)
        and 2 <= d <= MATMUL_MAX_DIM
    ):
        return "matmul"
    return "fft"


def _angles(d: int) -> jnp.ndarray:
    """(d, n_bins) angles ``2*pi*n*k/d``, generated in-trace.

    Device-side iotas, NOT cached host constants: a cached concrete array
    would either leak tracers out of the first enclosing jit (the round-4
    TPU battery died exactly that way) or bake an O(d^2) constant into
    the HLO (the remote-compile-size problem ``ops/torus.py`` solves the
    same way).  XLA CSEs the basis computation within a compiled program.
    ``n*k`` is reduced mod d in int32 BEFORE the float multiply: the raw
    product reaches ``(d-1)*(d//2)`` (~8.4M at d=4096, past f32's exact
    24-bit range) while ``(n*k) mod d < d`` is always exact.
    """
    n_bins = d // 2 + 1
    n = jnp.arange(d, dtype=jnp.int32)[:, None]
    k = jnp.arange(n_bins, dtype=jnp.int32)[None, :]
    nk = (n * k) % d  # (d, n_bins), exact in int32
    return (2.0 * math.pi / d) * nk.astype(jnp.float32)


def _fwd_bases(d: int):
    """(d, n_bins) cos/sin bases: re = x @ C, im = -(x @ S)."""
    ang = _angles(d)
    return jnp.cos(ang), jnp.sin(ang)


def _inv_bases(d: int):
    """(n_bins, d) weighted bases: x = re @ Cw + im @ Sw.

    irfft folds the Hermitian half-spectrum back:
        x_n = (1/d) [ F_0 + 2 sum_{k=1}^{K} (re_k cos - im_k sin) (+ F_Nyq cos) ]
    with the factor 2 dropped on bin 0 and (for even d) the Nyquist bin.
    """
    n_bins = d // 2 + 1
    ang = _angles(d).T  # (n_bins, d)
    w = jnp.full((n_bins, 1), 2.0 / d, dtype=jnp.float32)
    w = w.at[0].set(1.0 / d)
    if d % 2 == 0:
        w = w.at[-1].set(1.0 / d)
    return w * jnp.cos(ang), -w * jnp.sin(ang)


def rfft_pair(x: jnp.ndarray):
    """Real ``rfft`` as two matmuls: returns (re, im), each (..., d//2+1)."""
    d = x.shape[-1]
    C, S = _fwd_bases(d)
    x32 = x.astype(jnp.float32)
    re = jnp.matmul(x32, C, preferred_element_type=jnp.float32)
    im = -jnp.matmul(x32, S, preferred_element_type=jnp.float32)
    return re, im


def irfft_pair(re: jnp.ndarray, im: jnp.ndarray, d: int) -> jnp.ndarray:
    """Inverse of :func:`rfft_pair` for a Hermitian half-spectrum."""
    Cw, Sw = _inv_bases(d)
    return (
        jnp.matmul(re.astype(jnp.float32), Cw,
                   preferred_element_type=jnp.float32)
        + jnp.matmul(im.astype(jnp.float32), Sw,
                     preferred_element_type=jnp.float32)
    )


def bind_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution, complex-free (== ``ops.bind`` to ~1e-5)."""
    d = a.shape[-1]
    ra, ia = rfft_pair(a)
    rb, ib = rfft_pair(b)
    return irfft_pair(ra * rb - ia * ib, ra * ib + ia * rb, d).astype(a.dtype)


def unbind_deconv_matmul(ab: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """``irfft(rfft(ab) / (rfft(b) + 1e-12))`` in real arithmetic.

    The reference adds its 1e-12 epsilon to the COMPLEX spectrum, i.e. to
    the real part only (``utils/vsa.py:69``) — mirrored exactly here.
    """
    d = ab.shape[-1]
    ra, ia = rfft_pair(ab)
    rb, ib = rfft_pair(b)
    rb = rb + 1e-12
    den = rb * rb + ib * ib
    return irfft_pair(
        (ra * rb + ia * ib) / den, (ia * rb - ra * ib) / den, d
    ).astype(ab.dtype)


def unitary_from_phases(phi: jnp.ndarray, d: int,
                        dtype=jnp.float32) -> jnp.ndarray:
    """``irfft`` of the unit-magnitude spectrum [1, e^{i phi}, (1)]
    without complex dtypes — the matmul body of ``ops.unitary_init``."""
    n, n_phases = phi.shape
    n_bins = d // 2 + 1
    re = jnp.ones((n, n_bins), jnp.float32)
    im = jnp.zeros((n, n_bins), jnp.float32)
    re = re.at[:, 1 : n_phases + 1].set(jnp.cos(phi))
    im = im.at[:, 1 : n_phases + 1].set(jnp.sin(phi))
    return irfft_pair(re, im, d).astype(dtype)
