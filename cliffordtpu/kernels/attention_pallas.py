"""Fused RoPE + attention kernel for the ViT blocks (Pallas / Mosaic TPU).

The flagship decoder step is bound by kernel granularity, not FLOPs: the
round-2 profile (BASELINE.md) shows ~227 dot_general launches of ~22 us
at the model's small shapes (seq = patch_grid^2 + registers = 68,
head_dim = 64).  Per transformer block the XLA attention path is

    rotate(q), rotate(k)            (elementwise kernels)
    S = q k^T                        (batched dot_general)
    P = softmax(S)                   (fused VPU chain, HBM round-trip of S)
    O = P v                          (batched dot_general)

i.e. several launches plus two HBM round-trips of the (B, H, S, S) score
tensor per block.  At these sizes the whole per-(batch, head) working set
(three (S, head_dim) operands + the (S, S) scores) fits in a few hundred
KB of VMEM, so this kernel fuses the half-split RoPE rotation, both
matmuls, and the masked softmax into ONE launch per direction — scores
never touch HBM.  No online/flash decomposition is needed: seq is tiny
and whole-block softmax is exact.

Numerics: rotation and both matmuls run in f32 (``preferred_element_type``
f32; inputs are up-cast on load), softmax is the standard max-shifted
form — this matches ``jax.nn.dot_product_attention``'s f32-logit
behaviour, and the equality test checks the fused path against the pure
XLA path (``nn/vit_vae.py::apply_rotary_half`` + dot_product_attention)
to f32 tolerance.

The sequence axis is padded to a sublane multiple; padded KEY columns are
masked to -1e30 before the softmax, and padded QUERY rows cost nothing
(their q rows are zero -> uniform softmax) and are sliced away by the
caller.  The backward pass is the standard attention VJP fused the same
way (recompute scores in VMEM, then dV = P^T dO, dP = dO V^T,
dS = P (dP - rowsum(dP P)), dQr = s dS K_r, dKr = s dS^T Q_r) with the
inverse rotation applied in-kernel (RoPE is orthogonal per position:
rot^T = rot(-theta)).

Opt-in via ``CLIFFORDTPU_ATTENTION=pallas`` (see ``nn/vit_vae.py``);
reference behaviour lives at ``cliffordar_model.py:82-102`` (torch
scaled_dot_product_attention + complex RoPE).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cliffordtpu.kernels.torus_pallas import _round_up

_NEG = np.float32(-1e30)  # not -inf: keeps padded-row softmax NaN-free


def _swap_halves(x):
    """[x0 | x1] -> [x1 | x0] on the last (head_dim) axis."""
    h = x.shape[-1] // 2
    return jnp.concatenate([x[..., h:], x[..., :h]], axis=-1)


def _rot(x, c, s2):
    """Half-split RoPE: x * [cos|cos] + swap(x) * [-sin|sin].

    Equals ``nn.vit_vae.apply_rotary_half`` for one (S, head_dim) slab.
    The inverse rotation (angle -> -angle) is ``_rot(x, c, -s2)``.
    """
    return x * c + _swap_halves(x) * s2


def _softmax_masked(s, n_valid: int):
    """Row softmax over the last axis with columns >= n_valid masked out."""
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, c_ref, s2_ref, o_ref,
                *, n_heads: int, seq: int, scale: float):
    c = c_ref[:]
    s2 = s2_ref[:]
    for h in range(n_heads):
        q = _rot(q_ref[0, h].astype(jnp.float32), c, s2)
        k = _rot(k_ref[0, h].astype(jnp.float32), c, s2)
        v = v_ref[0, h].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = _softmax_masked(s, seq)
        o = jnp.dot(p, v, preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, c_ref, s2_ref, do_ref,
                dq_ref, dk_ref, dv_ref,
                *, n_heads: int, seq: int, scale: float):
    c = c_ref[:]
    s2 = s2_ref[:]
    for h in range(n_heads):
        qr = _rot(q_ref[0, h].astype(jnp.float32), c, s2)
        kr = _rot(k_ref[0, h].astype(jnp.float32), c, s2)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            qr, kr, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        p = _softmax_masked(s, seq)
        dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True)) * scale
        dqr = jnp.dot(ds, kr, preferred_element_type=jnp.float32)
        dkr = jax.lax.dot_general(ds, qr, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dq_ref[0, h] = _rot(dqr, c, -s2).astype(dq_ref.dtype)
        dk_ref[0, h] = _rot(dkr, c, -s2).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _specs(B, H, Sp, hd):
    blk = pl.BlockSpec((1, H, Sp, hd), lambda b: (b, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((Sp, hd), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return blk, tab


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _attn_core(qt, kt, vt, c, s2, seq: int):
    return _attn_fwd_call(qt, kt, vt, c, s2, seq)


def _attn_fwd_call(qt, kt, vt, c, s2, seq: int):
    B, H, Sp, hd = qt.shape
    blk, tab = _specs(B, H, Sp, hd)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_heads=H, seq=seq,
                          scale=1.0 / float(np.sqrt(hd))),
        out_shape=jax.ShapeDtypeStruct(qt.shape, qt.dtype),
        grid=(B,),
        in_specs=[blk, blk, blk, tab, tab],
        out_specs=blk,
    )(qt, kt, vt, c, s2)


def _attn_fwd(qt, kt, vt, c, s2, seq: int):
    return _attn_fwd_call(qt, kt, vt, c, s2, seq), (qt, kt, vt, c, s2)


def _attn_bwd(seq: int, res, g):
    qt, kt, vt, c, s2 = res
    B, H, Sp, hd = qt.shape
    blk, tab = _specs(B, H, Sp, hd)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, n_heads=H, seq=seq,
                          scale=1.0 / float(np.sqrt(hd))),
        out_shape=(jax.ShapeDtypeStruct(qt.shape, qt.dtype),) * 3,
        grid=(B,),
        in_specs=[blk, blk, blk, tab, tab, blk],
        out_specs=(blk, blk, blk),
    )(qt, kt, vt, c, s2, g)
    return dq, dk, dv, jnp.zeros_like(c), jnp.zeros_like(s2)


_attn_core.defvjp(_attn_fwd, _attn_bwd)


def fused_attention(q, k, v, cos, sin):
    """softmax(rot(q) rot(k)^T / sqrt(hd)) v in one kernel per direction.

    q, k, v: (B, S, H, hd); cos, sin: (S', hd//2) with S' >= S, or None
    for no rotation.  Returns (B, S, H, hd) in q's dtype.  Numerically
    equal (f32 tolerance) to ``apply_rotary_half`` on q and k followed by
    ``jax.nn.dot_product_attention``.
    """
    B, S, H, hd = q.shape
    Sp = _round_up(S, 8)
    if cos is None:
        c_half = jnp.ones((S, hd // 2), jnp.float32)
        s_half = jnp.zeros((S, hd // 2), jnp.float32)
    else:
        c_half = jnp.asarray(cos[:S], jnp.float32)
        s_half = jnp.asarray(sin[:S], jnp.float32)
    # table layout for the half-split rotation (see _rot)
    c = jnp.concatenate([c_half, c_half], axis=-1)
    s2 = jnp.concatenate([-s_half, s_half], axis=-1)
    pad = ((0, 0), (0, Sp - S), (0, 0), (0, 0))

    def to_bhsd(x):
        return jnp.pad(x, pad).transpose(0, 2, 1, 3)

    c = jnp.pad(c, ((0, Sp - S), (0, 0)))
    s2 = jnp.pad(s2, ((0, Sp - S), (0, 0)))
    out = _attn_core(to_bhsd(q), to_bhsd(k), to_bhsd(v), c, s2, S)
    return out.transpose(0, 2, 1, 3)[:, :S]


def attention_supported(q_shape) -> bool:
    """Shape gate for the fused path (caller also checks the backend).

    Budgeted on the BACKWARD working set (the larger of the two kernels):
    seven (1, H, Sp, hd) f32 blocks (q/k/v/do in + dq/dk/dv out), the two
    (Sp, hd) rotation tables, and ~3 live per-head (Sp, Sp) f32
    score/softmax temporaries — so shapes that pass the gate also compile
    when gradients are required (CLIFFORDTPU_ATTENTION=pallas training).
    """
    B, S, H, hd = q_shape
    Sp = _round_up(S, 8)
    working = (7 * H * Sp * hd + 2 * Sp * hd + 3 * Sp * Sp) * 4
    return hd % 2 == 0 and hd >= 8 and S >= 2 and \
        working < 6 * 1024 * 1024
