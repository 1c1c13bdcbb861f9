"""Fused Clifford-torus SAMPLER + embedding kernels (Pallas / Mosaic TPU).

``CliffordPowerSphericalDistribution.sample`` is, at large latent dims,
RNG-bound: the round-3 cnn4096 profile puts the ``reparam`` scope at 54%
of the whole train step, dominated by threefry u32 bit generation on the
VPU (BASELINE.md; both the ``rbg`` PRNG and partitionable threefry
measured slower end-to-end).  TWO kernels attack that floor by doing
everything on-core in one pass — uniforms, the exact closed-form circle
sampler (Bailey polar Student-t form,
``distributions/clifford_torus.py::sample``):
      nu = 2 (kappa + eps) + 1
      w  = expm1((-2/nu) ln U)
      theta = loc + 2 atan(cos(2 pi V) sqrt(w))
and the real-DFT torus embedding with in-kernel basis generation (same
dual-matmul scheme as ``torus_pallas.py``).  They differ ONLY in where
the uniforms come from:

* ``sample_torus_fused`` (CLIFFORDTPU_SAMPLER=pallas_rng) — the TPU's
  hardware PRNG (``pltpu.prng_seed`` / ``prng_random_bits``): cheapest
  bit-gen, but a DIFFERENT random stream than ``jax.random`` (still
  deterministic per caller key: the folded key words seed the PRNG).

* ``sample_torus_fused_keyed`` (CLIFFORDTPU_SAMPLER=pallas_keyed) — in-
  kernel threefry-2x32 on EXACTLY the counters jax's default
  partitionable bit-gen uses (hi=0, lo=flat index, out = bits1 ^
  bits2), keyed by the same ``jax.random.split(key)`` halves as the XLA
  sampler: the SAME stream.  The raw bits are bit-identical; V (no
  minval) is bit-identical; U carries <= 2 ulp of slack because XLA's
  algebraic simplifier freely reassociates the minval affine
  ``f * (1 - 1e-12) + 1e-12`` (jitted ``jax.random.uniform`` already
  differs from eager by the same 2 ulp on jax 0.9), and theta agrees to
  transcendental-implementation tolerance.

The sampler math and epsilons mirror the XLA path EXACTLY in both (same
formula, same 1e-12 U clamp, same `_PS_EPS`).  Both are OPT-IN and the
runners' default XLA keyed-threefry behavior is unchanged until an
on-chip paired A/B records a win (BASELINE.md).

Backward (reparameterized) gradients flow through a custom VJP: the
kernel also writes theta / U / V residuals; ``dtheta`` reuses the fused
transposed-basis kernel from ``torus_pallas``, and dloc / dkappa are a
short elementwise epilogue:

    dtheta/dloc   = 1
    dtheta/dkappa = [2 c / (1 + c^2 w)] * [1/(2 sqrt(w))]
                    * (2 ln U / nu^2) (1 + w) * 2,   c = cos(2 pi V)

(the sqrt(w) pole at U -> 1 is cancelled by ln U -> 0; a small floor on
sqrt(w) guards the fp32 corner).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliffordtpu.distributions.power_spherical import _EPS as _PS_EPS
from cliffordtpu.kernels.torus_pallas import (
    _round_up,
    _torus_fused_bwd,
    basis_tiles,
    const_cols,
)

_U_MIN = 1e-12  # must equal the XLA sampler's minval

# cnn4096's working set (six (TB, kp) f32 buffers + two (kp, TN) basis
# tiles + pipelining copies) sits just above XLA's 16 MB default scoped-
# VMEM limit; the target v5e core has 128 MB physical VMEM, so grant the
# sampler kernels headroom instead of shrinking TB (which would double
# the in-kernel basis regeneration).
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024


def _bits_to_unit_float(bits):
    """u32 -> f32 uniform in [0, 1): mantissa trick (1.m * 2^0 - 1)."""
    bits = pltpu.bitcast(bits, jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _expm1(x):
    """expm1 via Kahan's exp/log identity — Mosaic has no expm1 lowering.

    expm1(x) = (e^x - 1) * x / log(e^x) recovers the small-|x| digits
    that the naive ``exp(x) - 1`` cancels away (max observed error vs
    ``jnp.expm1`` is ~1 ulp across the sampler's x = (-2/nu) ln U >= 0
    range); at e^x == 1 the limit is x itself.  When e^x overflows to
    inf the Kahan quotient is inf*x/inf = NaN, so that branch returns
    e^x (= inf = expm1 there); the sampler's _U_MIN=1e-12 clamp keeps
    x <= ~55.3 so the guard is latent today, but the helper stays
    total if the clamp ever changes."""
    e = jnp.exp(x)
    em1 = e - 1.0
    safe = em1 * x / jnp.log(e)
    return jnp.where(e == 1.0, x, jnp.where(jnp.isinf(e), e, safe))


def _atan(x):
    """f32 arctan — Mosaic has no atan/atan2 lowering either.

    Cephes ``atanf`` range reduction (tan(pi/8) / tan(3pi/8) splits)
    plus its degree-9 odd minimax polynomial: |err| <~ 2 ulp vs
    ``jnp.arctan`` over the sampler's full input range, inside the
    "transcendental-implementation tolerance" the keyed variant already
    claims for theta."""
    ax = jnp.abs(x)
    big = ax > 2.414213562373095  # tan(3pi/8)
    mid = ax > 0.4142135623730951  # tan(pi/8)
    x0 = jnp.where(big, -1.0 / jnp.maximum(ax, 1e-30),
                   jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    y0 = jnp.where(big, jnp.float32(math.pi / 2),
                   jnp.where(mid, jnp.float32(math.pi / 4),
                             jnp.float32(0.0)))
    z = x0 * x0
    p = (((8.05374449538e-2 * z - 1.38776856032e-1) * z
          + 1.99777106478e-1) * z - 3.33329491539e-1) * z * x0 + x0
    return jnp.where(x < 0.0, -(y0 + p), y0 + p)


def _threefry2x32(k0, k1, x0, x1):
    """Threefry-2x32, the jax default PRNG, as traced u32 vector code.

    Bit-identical to ``jax._src.prng.threefry2x32`` (20 rounds, key
    injection every 4): feeding the counters ``jax.random`` uses makes
    in-kernel draws reproduce ``jax.random.uniform`` exactly.
    """
    def rotl(x, r):
        return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))

    rotations = ((13, 15, 26, 6), (17, 29, 16, 24))
    ks = (k0, k1, k0 ^ k1 ^ jnp.uint32(0x1BD11BDA))
    x0 = x0 + ks[0]
    x1 = x1 + ks[1]
    for i in range(5):
        for r in rotations[i % 2]:
            x0 = x0 + x1
            x1 = rotl(x1, r)
            x1 = x0 ^ x1
        x0 = x0 + ks[(i + 1) % 3]
        x1 = x1 + ks[(i + 2) % 3] + jnp.uint32(i + 1)
    return x0, x1


def _sample_embed_kernel(seed_ref, loc_ref, kap_ref,
                         out_ref, th_ref, u_ref, v_ref,
                         cos_sc, sin_sc,
                         *, d: int, TN: int, kp: int):
    j = pl.program_id(1)  # output-column tile (inner)
    i = pl.program_id(0)  # batch tile (OUTER — theta cached per tile)

    @pl.when(j == 0)
    def _draw_and_sample():
        # independent, deterministic stream per batch tile.  The tile
        # index is FOLDED into the two seed words (golden-ratio Weyl
        # increment) rather than passed as a third seed value: the axon
        # backend's Mosaic rejects prng_seed with >2 values
        # ("Setting seed with more than 2 values is not supported",
        # artifacts/bench_r4/chain_e.log).
        mix = i.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
        pltpu.prng_seed(seed_ref[0] + mix, seed_ref[1] ^ mix)
        shape = th_ref.shape
        u = _bits_to_unit_float(pltpu.prng_random_bits(shape))
        v = _bits_to_unit_float(pltpu.prng_random_bits(shape))
        u = jnp.maximum(u, _U_MIN)
        loc = loc_ref[:]
        kappa = kap_ref[:]
        nu = 2.0 * (kappa + _PS_EPS) + 1.0
        w = _expm1((-2.0 / nu) * jnp.log(u))
        theta = loc + 2.0 * _atan(
            jnp.cos((2.0 * math.pi) * v) * jnp.sqrt(w))
        th_ref[:] = theta
        u_ref[:] = u
        v_ref[:] = v

    # basis tiles for THIS j (regenerated per (i, j) — with the batch axis
    # outer there is no j-persistence; at the target config B fits one
    # batch tile so total generation cost matches torus_pallas exactly)
    cos_sc[:], sin_sc[:] = basis_tiles((kp, TN), d, k_axis=0,
                                       n_offset=j * TN)

    # theta is read back from the th OUTPUT block: its index map (i, 0) is
    # constant across the inner j loop, so Mosaic keeps it resident in
    # VMEM (revisiting-output pattern) — a separate (TB, kp) scratch copy
    # was what pushed cnn4096 108 KB past the 16 MB scoped-VMEM default
    # (artifacts/bench_r4/chain_b.log).
    th = th_ref[:]
    out_ref[:] = (
        jnp.dot(jnp.cos(th), cos_sc[:], preferred_element_type=jnp.float32)
        + jnp.dot(jnp.sin(th), sin_sc[:], preferred_element_type=jnp.float32)
        + const_cols(out_ref.shape, d, j * TN)
    )


def _sample_embed_call(seed, loc_pad, kap_pad, d: int):
    B, kp = loc_pad.shape
    n = 2 * d
    np_ = _round_up(n, 128)
    # VMEM accounting: unlike torus_pallas (ONE (TB, kp) input block),
    # this kernel keeps SIX (TB, kp) f32 buffers resident (loc, kappa in;
    # theta, u, v out; th scratch) plus two (kp, TN) basis tiles — at
    # d=4096 that is ~98 KB/row, so TB=256 would need ~28 MB and fail the
    # ~16 MB VMEM budget.  Scale the batch tile down with kp.
    TB = min(B, 256 if kp <= 1024 else (128 if kp <= 2048 else 64))
    TN = 128 if kp > 1024 else min(512, np_)
    grid = (pl.cdiv(B, TB), pl.cdiv(np_, TN))  # i outer, j inner
    return pl.pallas_call(
        functools.partial(_sample_embed_kernel, d=d, TN=TN, kp=kp),
        out_shape=(
            jax.ShapeDtypeStruct((B, np_), jnp.float32),  # x
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # theta
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # u
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # v
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((kp, TN), jnp.float32),
            pltpu.VMEM((kp, TN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(seed, loc_pad, kap_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_embed(seed, loc_pad, kap_pad, d: int):
    x, _, _, _ = _sample_embed_call(seed, loc_pad, kap_pad, d)
    return x


def _sample_embed_fwd(seed, loc_pad, kap_pad, d: int):
    x, th, u, v = _sample_embed_call(seed, loc_pad, kap_pad, d)
    return x, (th, u, v, kap_pad)


def _sample_embed_bwd(d: int, res, g):
    th, u, v, kap_pad = res
    # dtheta via the fused transposed-basis kernel (same math as embed bwd)
    (dth,) = _torus_fused_bwd(d, th, g)
    # elementwise epilogue: dloc = dth; dkappa = dth * dtheta/dkappa
    nu = 2.0 * (kap_pad + _PS_EPS) + 1.0
    lnu = jnp.log(u)
    w = jnp.expm1((-2.0 / nu) * lnu)
    c = jnp.cos((2.0 * math.pi) * v)
    sqw = jnp.sqrt(jnp.maximum(w, 1e-30))
    s2 = c * c * w
    # dtheta/dnu = [2 c / (1 + s^2)] * [1/(2 sqrt(w))] * (2 lnU / nu^2)(1+w)
    dth_dnu = (2.0 * c / (1.0 + s2)) * (1.0 / (2.0 * sqw)) * (
        (2.0 * lnu / (nu * nu)) * (1.0 + w))
    dkap = dth * dth_dnu * 2.0  # dnu/dkappa = 2
    return (None, dth, dkap)


_sample_embed.defvjp(_sample_embed_fwd, _sample_embed_bwd)


# ---- keyed variant: in-kernel threefry, bit-exact with jax.random ----


def _xla_uniform_from_bits(bits, minval: float):
    """u32 bits -> f32 uniform, replicating ``jax.random.uniform``'s
    arithmetic exactly (jax/_src/random.py::_uniform): mantissa-trick
    float in [0, 1), then ``max(minval, f * (maxval - minval) + minval)``
    in f32.  With the same bits this returns the same floats as the XLA
    path, so kernels built on it are SAME-STREAM with keyed
    ``jax.random`` draws."""
    f = _bits_to_unit_float(bits)
    if minval == 0.0:
        return f  # max(0, f*1 + 0) == f for f in [0, 1)
    mv = jnp.float32(minval)
    sc = jnp.float32(1.0) - mv  # what XLA constant-folds (maxval-minval)
    return jnp.maximum(mv, f * sc + mv)


def _keyed_sample_embed_kernel(seed_ref, loc_ref, kap_ref,
                               out_ref, th_ref, u_ref, v_ref,
                               cos_sc, sin_sc,
                               *, d: int, TN: int, kp: int, TB: int):
    """Same structure as ``_sample_embed_kernel``, but the uniforms come
    from in-kernel threefry-2x32 on EXACTLY the counters jax 0.9's
    default partitionable bit-gen uses
    (prng.py::_threefry_random_bits_partitionable): per element at flat
    index q = r*d + c the counter pair is (hi=0, lo=q) and the output
    word is ``bits1 ^ bits2`` — so u and v are bit-identical to
    ``jax.random.uniform(k_u/k_v, (B, d))`` at the same one-threefry-
    per-element arithmetic cost as the XLA path."""
    j = pl.program_id(1)  # output-column tile (inner)
    i = pl.program_id(0)  # batch tile (OUTER — theta cached per tile)

    @pl.when(j == 0)
    def _draw_and_sample():
        r = jax.lax.broadcasted_iota(jnp.int32, (TB, kp), 0) + i * TB
        cc = jax.lax.broadcasted_iota(jnp.int32, (TB, kp), 1)
        # kernel col cc is angle index cc+1 (angle 0 never embeds);
        # padded cols duplicate the last real counter — values unused
        c = jnp.minimum(cc + 1, d - 1)
        lo = pltpu.bitcast(r * d + c, jnp.uint32)
        hi = jnp.zeros_like(lo)
        a0, a1 = _threefry2x32(seed_ref[0], seed_ref[1], hi, lo)
        b0, b1 = _threefry2x32(seed_ref[2], seed_ref[3], hi, lo)
        u = _xla_uniform_from_bits(a0 ^ a1, _U_MIN)
        v = _xla_uniform_from_bits(b0 ^ b1, 0.0)
        loc = loc_ref[:]
        kappa = kap_ref[:]
        nu = 2.0 * (kappa + _PS_EPS) + 1.0
        w = _expm1((-2.0 / nu) * jnp.log(u))
        theta = loc + 2.0 * _atan(
            jnp.cos((2.0 * math.pi) * v) * jnp.sqrt(w))
        th_ref[:] = theta
        u_ref[:] = u
        v_ref[:] = v

    cos_sc[:], sin_sc[:] = basis_tiles((kp, TN), d, k_axis=0,
                                       n_offset=j * TN)
    # read theta from the resident th output block (see
    # _sample_embed_kernel — dropping the scratch copy keeps cnn4096
    # inside the scoped-VMEM budget)
    th = th_ref[:]
    out_ref[:] = (
        jnp.dot(jnp.cos(th), cos_sc[:], preferred_element_type=jnp.float32)
        + jnp.dot(jnp.sin(th), sin_sc[:], preferred_element_type=jnp.float32)
        + const_cols(out_ref.shape, d, j * TN)
    )


def _keyed_sample_embed_call(seeds, loc_pad, kap_pad, d: int):
    B, kp = loc_pad.shape
    n = 2 * d
    np_ = _round_up(n, 128)
    # same six-(TB, kp)-buffer VMEM budget as _sample_embed_call
    TB = min(B, 256 if kp <= 1024 else (128 if kp <= 2048 else 64))
    TN = 128 if kp > 1024 else min(512, np_)
    grid = (pl.cdiv(B, TB), pl.cdiv(np_, TN))  # i outer, j inner
    return pl.pallas_call(
        functools.partial(_keyed_sample_embed_kernel, d=d, TN=TN, kp=kp,
                          TB=TB),
        out_shape=(
            jax.ShapeDtypeStruct((B, np_), jnp.float32),  # x
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # theta
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # u
            jax.ShapeDtypeStruct((B, kp), jnp.float32),   # v
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TB, TN), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((kp, TN), jnp.float32),
            pltpu.VMEM((kp, TN), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_BYTES),
    )(seeds, loc_pad, kap_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _keyed_sample_embed(seeds, loc_pad, kap_pad, d: int):
    x, _, _, _ = _keyed_sample_embed_call(seeds, loc_pad, kap_pad, d)
    return x


def _keyed_sample_embed_fwd(seeds, loc_pad, kap_pad, d: int):
    x, th, u, v = _keyed_sample_embed_call(seeds, loc_pad, kap_pad, d)
    return x, (th, u, v, kap_pad)


def _keyed_sample_embed_bwd(d: int, res, g):
    # identical math to the hw-PRNG variant (residual layout matches)
    dummy, dth, dkap = _sample_embed_bwd(d, res, g)
    return (None, dth, dkap)


_keyed_sample_embed.defvjp(_keyed_sample_embed_fwd, _keyed_sample_embed_bwd)


def _raw_key_words(k):
    if jnp.issubdtype(k.dtype, jax.dtypes.prng_key):
        k = jax.random.key_data(k)
    return k.astype(jnp.uint32).reshape(-1)[:2]


def _keyed_sample_torus(key, loc2, kap2, d: int, B: int):
    """Padding + seed plumbing around the keyed kernel (2-D inputs);
    callable directly from interpret-mode tests."""
    kp = _round_up(d - 1, 8)
    Bp = _round_up(B, 8)
    k_u, k_v = jax.random.split(key)
    seeds = jnp.concatenate([_raw_key_words(k_u), _raw_key_words(k_v)])
    loc_pad = jnp.zeros((Bp, kp), jnp.float32).at[:B, : d - 1].set(
        loc2[:, 1:])
    kap_pad = jnp.ones((Bp, kp), jnp.float32).at[:B, : d - 1].set(
        kap2[:, 1:])
    x = _keyed_sample_embed(seeds, loc_pad, kap_pad, d)
    return x[:B, : 2 * d]


def sample_torus_fused_keyed(key, loc, kappa):
    """Keyed fused sampler+embed: SAME random stream as the XLA sampler.

    Unlike ``sample_torus_fused`` (hardware PRNG, different stream),
    this kernel generates its two uniforms in-kernel with threefry-2x32
    on exactly the counters ``jax.random.uniform`` uses under jax's
    default partitionable bit-gen, so u and v are BIT-IDENTICAL to the
    keyed XLA path (theta then agrees to transcendental-implementation
    tolerance).  Fuses bit-gen + transcendentals + the DFT matmul in
    VMEM — attacking the cnn4096 profile's 54%-of-step reparam share
    (BASELINE.md r3) without changing the random stream.  Opt-in:
    CLIFFORDTPU_SAMPLER=pallas_keyed.

    Returns None (caller keeps the XLA path) off-TPU, for unsupported
    dims, or when ``jax_threefry_partitionable`` is disabled (the
    original counter scheme is a different stream)."""
    from cliffordtpu.ops.torus import MATMUL_MAX_DIM

    d = loc.shape[-1]
    if d < 2 or d > MATMUL_MAX_DIM or jax.default_backend() == "cpu":
        return None
    if not jax.config.jax_threefry_partitionable:
        return None
    batch_shape = loc.shape[:-1]
    B = 1
    for s in batch_shape:
        B *= int(s)
    if B < 1:
        return None
    loc2 = loc.reshape(-1, d).astype(jnp.float32)
    kap2 = jnp.broadcast_to(kappa, loc.shape).reshape(-1, d)
    kap2 = kap2.astype(jnp.float32)
    x = _keyed_sample_torus(key, loc2, kap2, d, B)
    return x.reshape(*batch_shape, 2 * d).astype(loc.dtype)


def sample_torus_fused(key, loc, kappa):
    """One-kernel replacement for
    ``CliffordPowerSphericalDistribution.sample`` at large d on TPU.

    Returns the (..., 2d) torus embedding of hardware-PRNG circle draws.
    Falls back to None off-TPU / for unsupported shapes (caller keeps the
    XLA path).  Stream caveat in the module docstring.
    """
    from cliffordtpu.ops.torus import MATMUL_MAX_DIM

    d = loc.shape[-1]
    if d < 2 or d > MATMUL_MAX_DIM or jax.default_backend() == "cpu":
        return None
    batch_shape = loc.shape[:-1]
    loc1 = loc.reshape(-1, d)[:, 1:].astype(jnp.float32)  # angle 0 pinned
    kap1 = jnp.broadcast_to(kappa, loc.shape).reshape(-1, d)[:, 1:]
    kap1 = kap1.astype(jnp.float32)
    B = loc1.shape[0]
    kp = _round_up(d - 1, 8)
    Bp = _round_up(B, 8)
    loc_pad = jnp.zeros((Bp, kp), jnp.float32).at[:B, : d - 1].set(loc1)
    # pad kappa with 1.0 (keeps nu sane; padded thetas are never read:
    # the basis rows for k >= d are zeroed in-kernel)
    kap_pad = jnp.ones((Bp, kp), jnp.float32).at[:B, : d - 1].set(kap1)
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    # deterministic per caller key: the folded raw key words seed the
    # hardware PRNG (same key -> same draws on the same hardware)
    seed = jax.random.key_data(
        jax.random.fold_in(jax.random.wrap_key_data(key), 0x7A11A5)
    ).astype(jnp.uint32).reshape(-1)[:2]
    x = _sample_embed(seed, loc_pad, kap_pad, d)
    return x[:B, : 2 * d].reshape(*batch_shape, 2 * d).astype(loc.dtype)
