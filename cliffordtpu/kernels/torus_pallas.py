"""Fused Clifford-torus embedding kernel (Pallas / Mosaic TPU).

Computes ``x = cos(th) @ C + sin(th) @ S + c`` — the exact real-DFT torus
embedding of ``cliffordtpu.ops.torus.angles_to_torus`` — in ONE kernel:
the cos/sin of the angles are produced in VMEM and fed straight to the MXU,
so the (B, d-1) cos/sin intermediates never round-trip through HBM (XLA
materializes at least one of them because both matmuls consume them).

Backward pass is fused the same way (custom VJP):
``dth = (-sin(th)) * (g @ C^T) + cos(th) * (g @ S^T)``.

Grid: (B / TB, N / TN) with the full angle row per tile; bases are tiled on
the output axis.  Shapes are padded to the (8, 128) f32 tile internally.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliffordtpu.ops.torus import _torus_bases


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fwd_kernel(th_ref, cos_b_ref, sin_b_ref, const_ref, out_ref):
    th = th_ref[:]
    c = jnp.cos(th)
    s = jnp.sin(th)
    out = (
        jnp.dot(c, cos_b_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(s, sin_b_ref[:], preferred_element_type=jnp.float32)
        + const_ref[:]
    )
    out_ref[:] = out


def _bwd_kernel(th_ref, g_ref, cos_bt_ref, sin_bt_ref, dth_ref):
    th = th_ref[:]
    g = g_ref[:]
    gc = jnp.dot(g, cos_bt_ref[:], preferred_element_type=jnp.float32)
    gs = jnp.dot(g, sin_bt_ref[:], preferred_element_type=jnp.float32)
    dth_ref[:] = -jnp.sin(th) * gc + jnp.cos(th) * gs


def _padded_bases(d: int):
    cos_b, sin_b, const = _torus_bases(d)
    k, n = cos_b.shape  # (d-1, 2d)
    kp, np_ = _round_up(k, 8), _round_up(n, 128)
    cb = np.zeros((kp, np_), np.float32)
    sb = np.zeros((kp, np_), np.float32)
    cc = np.zeros((1, np_), np.float32)
    cb[:k, :n] = cos_b
    sb[:k, :n] = sin_b
    cc[0, :n] = const
    return cb, sb, cc, k, n, kp, np_


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _torus_fused_2d(th_pad, d: int):
    return _torus_fused_fwd_impl(th_pad, d)


def _torus_fused_fwd_impl(th_pad, d: int):
    cb, sb, cc, k, n, kp, np_ = _padded_bases(d)
    B = th_pad.shape[0]
    TB = min(256, B)
    TN = min(512, np_)
    grid = (pl.cdiv(B, TB), pl.cdiv(np_, TN))
    out = pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, np_), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(th_pad, jnp.asarray(cb), jnp.asarray(sb), jnp.asarray(cc))
    return out


def _torus_fused_fwd(th_pad, d: int):
    return _torus_fused_fwd_impl(th_pad, d), th_pad


def _torus_fused_bwd(d: int, th_pad, g):
    cb, sb, cc, k, n, kp, np_ = _padded_bases(d)
    B = th_pad.shape[0]
    TB = min(256, B)
    cbt = jnp.asarray(cb.T.copy())  # (np_, kp)
    sbt = jnp.asarray(sb.T.copy())
    grid = (pl.cdiv(B, TB),)
    dth = pl.pallas_call(
        _bwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, kp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, np_), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((np_, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(th_pad, g, cbt, sbt)
    return (dth,)


_torus_fused_2d.defvjp(_torus_fused_fwd, _torus_fused_bwd)


def angles_to_torus_fused(angles: jnp.ndarray) -> jnp.ndarray:
    """Drop-in fused version of ``ops.torus.angles_to_torus`` (matmul path).

    Falls back to the jnp implementation off-TPU or for d > 2048 (base
    matrices too large for useful VMEM tiling at that point).
    """
    d = angles.shape[-1]
    if d < 2 or d > 2048 or jax.default_backend() == "cpu":
        from cliffordtpu.ops.torus import MATMUL_MAX_DIM, angles_to_torus

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
