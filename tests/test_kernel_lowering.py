"""Mosaic TPU lowering regression tests for every Pallas kernel.

Interpret mode (tests/test_kernels.py) runs the kernels as plain traced
jnp on CPU, so it can NOT catch primitives Mosaic has no TPU lowering
rule for — exactly how ``expm1``/``atan`` in the fused samplers passed
every interpret test and then failed on-chip with
``NotImplementedError: Unimplemented primitive in Pallas TPU lowering``
(round-4 chain, artifacts/bench_r4/chain.log).  ``jax.export`` runs the
real Mosaic lowering pipeline for ``platforms=["tpu"]`` from any host
backend, so these tests fail on CPU the moment a kernel uses an
unsupported primitive — fwd AND bwd.
"""

import functools

import jax
import jax.numpy as jnp
import pytest
from jax import export

from cliffordtpu.kernels import sampler_pallas as sp
from cliffordtpu.kernels import torus_pallas as tp


def _lower_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert len(exp.mlir_module()) > 0


def _pad_loc_kappa(d, B):
    kp = sp._round_up(d - 1, 8)
    Bp = sp._round_up(B, 8)
    loc_pad = jnp.zeros((Bp, kp), jnp.float32)
    kap_pad = jnp.ones((Bp, kp), jnp.float32)
    return loc_pad, kap_pad


@pytest.mark.parametrize("d,B", [(128, 8), (4096, 64)])
def test_torus_fused_lowers_fwd_bwd(d, B):
    kp = sp._round_up(d - 1, 8)
    th = jnp.zeros((sp._round_up(B, 8), kp), jnp.float32)

    def loss(th):
        return jnp.sum(tp._torus_fused_2d(th, d) ** 2)

    _lower_tpu(jax.grad(loss), th)


@pytest.mark.parametrize("d,B", [(128, 8), (4096, 64)])
def test_sampler_rng_lowers_fwd_bwd(d, B):
    loc_pad, kap_pad = _pad_loc_kappa(d, B)
    seed = jnp.zeros((2,), jnp.uint32)

    def loss(loc_pad, kap_pad):
        return jnp.sum(sp._sample_embed(seed, loc_pad, kap_pad, d) ** 2)

    _lower_tpu(jax.grad(loss, argnums=(0, 1)), loc_pad, kap_pad)


@pytest.mark.parametrize("d,B", [(128, 8), (4096, 64)])
def test_sampler_keyed_lowers_fwd_bwd(d, B):
    loc_pad, kap_pad = _pad_loc_kappa(d, B)
    seeds = jnp.zeros((4,), jnp.uint32)

    def loss(loc_pad, kap_pad):
        return jnp.sum(
            sp._keyed_sample_embed(seeds, loc_pad, kap_pad, d) ** 2)

    _lower_tpu(jax.grad(loss, argnums=(0, 1)), loc_pad, kap_pad)


def test_attention_lowers_fwd_bwd():
    from cliffordtpu.kernels import attention_pallas as ap

    B, H, S, hd = 2, 4, 68, 64
    Sp = sp._round_up(S, 128)
    qt = jnp.zeros((B, H, Sp, hd), jnp.float32)
    c = jnp.ones((Sp, hd), jnp.float32)
    s2 = jnp.zeros((Sp, hd), jnp.float32)

    def loss(qt):
        return jnp.sum(ap._attn_core(qt, qt, qt, c, s2, S) ** 2)

    _lower_tpu(jax.grad(loss), qt)
