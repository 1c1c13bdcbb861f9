"""Fused Clifford-torus embedding kernel (Pallas / Mosaic TPU).

Computes ``x = cos(th) @ C + sin(th) @ S + c`` — the exact real-DFT torus
embedding of ``cliffordtpu.ops.torus.angles_to_torus`` — in ONE kernel:
the cos/sin of the angles are produced in VMEM and fed straight to the
MXU, and the DFT bases are GENERATED IN-KERNEL from iotas into VMEM
scratch (cached across batch tiles), so

* no (B, d-1) cos/sin intermediate ever round-trips through HBM,
* no basis matrix exists in HBM or as an HLO constant at all — at
  d=4096 the host-constant bases are ~268 MB, which both overflows the
  tunneled remote-compile request limit and costs a full HBM read per
  call (see ``ops/torus.py::_torus_bases_device`` for the XLA-path
  version of this argument; here the bases never leave VMEM).

The phase ``2*pi*k*j/n`` is reduced mod n in int32 BEFORE the float
multiply: k*j reaches 33.5M at d=4096, beyond f32's exact-integer range,
while (k*j) % n < 2d is always exact.

Backward pass is fused the same way (custom VJP):
``dth = (-sin(th)) * (g @ C^T) + cos(th) * (g @ S^T)``, with the
transposed basis tiles likewise generated into scratch.

Grids put the basis-tile axis OUTER and the batch axis INNER, so each
scratch basis tile is generated once (at batch-tile 0) and reused for
every batch tile — generation cost is one full basis sweep per call,
independent of batch size.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def basis_tiles(shape, d: int, *, k_axis: int, k_offset=0, n_offset=0):
    """Generate (cos, sin) real-DFT basis tiles in-kernel (traced code).

    ``k_axis`` says which iota axis carries the (1-based) angle index k;
    the other axis carries the global output-column index.  The phase
    ``2*pi*k*j/n`` is reduced mod n in int32 BEFORE the float multiply:
    k*j reaches 33.5M at d=4096, beyond f32's exact-integer range, while
    (k*j) % n < 2d is always exact.  Padded k rows (k > d-1) and padded
    output columns (col >= n) are zeroed so callers' padding never leaks
    (th pad entries are 0 but cos(0) = 1 would still contribute).

    Shared by the torus fwd/bwd kernels AND the fused sampler kernel —
    a masking or phase fix here serves all three.
    """
    n = 2 * d
    i0 = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    k = (i0 if k_axis == 0 else i1) + 1 + k_offset
    col = (i1 if k_axis == 0 else i0) + n_offset
    phase = ((k * col) % n).astype(jnp.float32) * (2.0 * math.pi / n)
    valid = (k <= d - 1) & (col < n)
    cos_t = jnp.where(valid, (2.0 / n) * jnp.cos(phase), 0.0)
    sin_t = jnp.where(valid, -(2.0 / n) * jnp.sin(phase), 0.0)
    return cos_t, sin_t


def const_cols(shape, d: int, n_offset):
    """The embedding's constant term: (1 + (-1)^col)/n = 2/n on even
    columns, masked to the real n output columns."""
    n = 2 * d
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1) + n_offset
    return jnp.where((col % 2 == 0) & (col < n), 2.0 / n, 0.0)


def _fwd_kernel(th_ref, out_ref, cos_sc, sin_sc, *, d: int, TN: int):
    j = pl.program_id(0)  # output-column tile (outer)
    i = pl.program_id(1)  # batch tile (inner)

    @pl.when(i == 0)
    def _generate_basis():
        cos_sc[:], sin_sc[:] = basis_tiles(
            cos_sc.shape, d, k_axis=0, n_offset=j * TN)

    th = th_ref[:]
    out_ref[:] = (
        jnp.dot(jnp.cos(th), cos_sc[:], preferred_element_type=jnp.float32)
        + jnp.dot(jnp.sin(th), sin_sc[:], preferred_element_type=jnp.float32)
        + const_cols(out_ref.shape, d, j * TN)
    )


def _bwd_kernel(th_ref, g_ref, dth_ref, cbt_sc, sbt_sc, *, d: int, TK: int):
    kk = pl.program_id(0)  # k tile (outer)
    i = pl.program_id(1)   # batch tile (inner)

    @pl.when(i == 0)
    def _generate_basis_t():
        # transposed orientation: rows carry the output index, columns k
        cbt_sc[:], sbt_sc[:] = basis_tiles(
            cbt_sc.shape, d, k_axis=1, k_offset=kk * TK)

    th = th_ref[:]
    g = g_ref[:]
    gc = jnp.dot(g, cbt_sc[:], preferred_element_type=jnp.float32)
    gs = jnp.dot(g, sbt_sc[:], preferred_element_type=jnp.float32)
    dth_ref[:] = -jnp.sin(th) * gc + jnp.cos(th) * gs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _torus_fused_2d(th_pad, d: int):
    return _torus_fused_fwd_impl(th_pad, d)


def _torus_fused_fwd_impl(th_pad, d: int):
    B, kp = th_pad.shape
    n = 2 * d
    np_ = _round_up(n, 128)
    TB = min(256, B)
    # keep scratch + th tile well under VMEM: 2 * kp * TN * 4B of scratch
    TN = 128 if kp > 1024 else min(512, np_)
    grid = (pl.cdiv(np_, TN), pl.cdiv(B, TB))  # j outer, i inner
    return pl.pallas_call(
        functools.partial(_fwd_kernel, d=d, TN=TN),
        out_shape=jax.ShapeDtypeStruct((B, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, kp), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda j, i: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((kp, TN), jnp.float32),
            pltpu.VMEM((kp, TN), jnp.float32),
        ],
    )(th_pad)


def _torus_fused_fwd(th_pad, d: int):
    return _torus_fused_fwd_impl(th_pad, d), th_pad


def _torus_fused_bwd(d: int, th_pad, g):
    B, kp = th_pad.shape
    n = 2 * d
    np_ = _round_up(n, 128)
    TB = min(128, B)
    TK = 128 if np_ > 1024 else min(512, kp)
    grid = (pl.cdiv(kp, TK), pl.cdiv(B, TB))  # k tile outer, batch inner
    dth = pl.pallas_call(
        functools.partial(_bwd_kernel, d=d, TK=TK),
        out_shape=jax.ShapeDtypeStruct((B, kp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TK), lambda k, i: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, np_), lambda k, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TK), lambda k, i: (i, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((np_, TK), jnp.float32),
            pltpu.VMEM((np_, TK), jnp.float32),
        ],
    )(th_pad, g)
    return (dth,)


_torus_fused_2d.defvjp(_torus_fused_fwd, _torus_fused_bwd)


def angles_to_torus_fused(angles: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused version of ``ops.torus.angles_to_torus`` (matmul path).

    Falls back to the jnp implementation off-TPU, for degenerate dims, and
    for d > MATMUL_MAX_DIM (4096): past that, the backward pass's g tile
    (TB x 2d) plus two (2d, TK) basis scratch tiles outgrow the ~16 MB
    VMEM budget (~12 MB at d=4096 already), so larger dims would fail at
    compile time instead of degrading — route them to the FFT path.
    """
    from cliffordtpu.ops.torus import MATMUL_MAX_DIM, angles_to_torus

    d = angles.shape[-1]
    if d < 2 or d > MATMUL_MAX_DIM or jax.default_backend() == "cpu":
        # explicit method: "auto" would re-enter this function when the
        # CLIFFORDTPU_TORUS_METHOD=pallas opt-in is set (infinite recursion)
        return angles_to_torus(
            angles, method="matmul" if d <= MATMUL_MAX_DIM else "fft")
    batch_shape = angles.shape[:-1]
    th = angles.reshape(-1, d)[:, 1:].astype(jnp.float32)  # angle 0 pinned
    B = th.shape[0]
    kp = _round_up(d - 1, 8)
    Bp = _round_up(B, 8)
    th_pad = jnp.zeros((Bp, kp), jnp.float32)
    th_pad = th_pad.at[:B, : d - 1].set(th)
    out = _torus_fused_2d(th_pad, d)
    return out[:B, : 2 * d].reshape(*batch_shape, 2 * d).astype(angles.dtype)
