"""Pallas kernel tests — run in interpret mode on CPU (the real-TPU path is
exercised by bench.py); correctness vs the pure-jnp reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cliffordtpu.distributions.power_spherical import _EPS as _PS_EPS
from cliffordtpu.ops.torus import angles_to_torus

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("d,B", [(8, 16), (64, 32), (129, 8), (600, 4)])
def test_fused_torus_matches_reference_interpret(d, B):
    from cliffordtpu.kernels import torus_pallas as tp

    angles = jax.random.uniform(KEY, (B, d)) * 2 * np.pi
    want = np.asarray(angles_to_torus(angles))
    with pltpu.force_tpu_interpret_mode():
        # bypass the cpu fallback to exercise the kernel in interpret mode
        th = angles[:, 1:].astype(jnp.float32)
        kp = tp._round_up(d - 1, 8)
        Bp = tp._round_up(B, 8)
        th_pad = jnp.zeros((Bp, kp), jnp.float32).at[:B, : d - 1].set(th)
        out = tp._torus_fused_fwd_impl(th_pad, d)
        got = np.asarray(out)[:B, : 2 * d]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_torus_gradient_interpret():
    from cliffordtpu.kernels import torus_pallas as tp

    d, B = 16, 8
    angles = jax.random.uniform(KEY, (B, d))

    def loss_ref(a):
        return jnp.sum(angles_to_torus(a) ** 2)

    def loss_fused(a):
        th = a[:, 1:].astype(jnp.float32)
        kp = tp._round_up(d - 1, 8)
        Bp = tp._round_up(B, 8)
        th_pad = jnp.zeros((Bp, kp), jnp.float32).at[:B, : d - 1].set(th)
        out = tp._torus_fused_2d(th_pad, d)[:B, : 2 * d]
        return jnp.sum(out ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(angles))
    with pltpu.force_tpu_interpret_mode():
        g_fused = np.asarray(jax.grad(loss_fused)(angles))
    np.testing.assert_allclose(g_fused[:, 1:], g_ref[:, 1:], atol=1e-4)


def test_public_wrapper_cpu_fallback():
    """On CPU the public API transparently falls back to jnp."""
    from cliffordtpu.kernels import angles_to_torus_fused

    angles = jax.random.uniform(KEY, (4, 12)) * 2 * np.pi
    np.testing.assert_allclose(
        np.asarray(angles_to_torus_fused(angles)),
        np.asarray(angles_to_torus(angles)),
        atol=1e-6,
    )


def test_env_optin_no_recursion(monkeypatch):
    """CLIFFORDTPU_TORUS_METHOD=pallas must not recurse through the CPU
    fallback (regression: auto -> pallas -> fallback -> auto loop)."""
    monkeypatch.setenv("CLIFFORDTPU_TORUS_METHOD", "pallas")
    a = jax.random.uniform(KEY, (4, 12)) * 2 * np.pi
    out = angles_to_torus(a)
    ref = angles_to_torus(a, method="matmul")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


# ---------------------------------------------------------------------------
# fused sampler+embed kernel (kernels/sampler_pallas.py)
# ---------------------------------------------------------------------------

def _sampler_inputs(d, B, kappa_val=5.0, seed=(123, 456)):
    from cliffordtpu.kernels import sampler_pallas as sp
    from cliffordtpu.kernels.torus_pallas import _round_up

    loc = jax.random.uniform(KEY, (B, d)) * 2 * np.pi - np.pi
    kp = _round_up(d - 1, 8)
    Bp = _round_up(B, 8)
    loc_pad = jnp.zeros((Bp, kp)).at[:B, : d - 1].set(loc[:, 1:])
    kap_pad = jnp.ones((Bp, kp)).at[:B, : d - 1].set(kappa_val)
    return sp, jnp.array(seed, jnp.uint32), loc_pad, kap_pad, loc


@pytest.mark.parametrize("d,B", [(9, 16), (64, 8)])
def test_fused_sampler_internal_consistency(d, B):
    """The kernel's x output must be the exact torus embedding of its own
    theta residual, and theta must satisfy the closed-form circle-sampler
    formula (distributions/clifford_torus.py::sample) on its own (u, v)
    residuals — same formula, same 1e-12/1e-7 (_PS_EPS) epsilons."""
    sp, seed, loc_pad, kap_pad, _ = _sampler_inputs(d, B)
    with pltpu.force_tpu_interpret_mode():
        x, th, u, v = sp._sample_embed_call(seed, loc_pad, kap_pad, d)
    x, th, u, v = map(np.asarray, (x, th, u, v))
    ang = np.concatenate([np.zeros((B, 1)), th[:B, : d - 1]], -1)
    want = np.asarray(angles_to_torus(jnp.asarray(ang)))
    np.testing.assert_allclose(x[:B, : 2 * d], want, atol=1e-5)
    nu = 2.0 * (kap_pad + _PS_EPS) + 1.0
    w = np.expm1((-2.0 / nu) * np.log(u))
    th_want = loc_pad + 2.0 * np.arctan(np.cos(2 * np.pi * v) * np.sqrt(w))
    np.testing.assert_allclose(th, np.asarray(th_want), atol=1e-6)
    assert u.min() >= 1e-12 and u.max() < 1.0 and v.min() >= 0.0


def test_fused_sampler_gradients_match_reconstruction():
    """Custom-VJP dloc/dkappa vs autodiff of the pure-jnp sampler+embed
    rebuilt from the kernel's own (u, v) residuals."""
    d, B = 9, 16
    sp, seed, loc_pad, kap_pad, _ = _sampler_inputs(d, B)
    kap_pad = kap_pad.at[:B, : d - 1].set(
        jax.random.uniform(jax.random.PRNGKey(7), (B, d - 1)) * 20 + 0.5)
    W = jax.random.normal(jax.random.PRNGKey(3), (loc_pad.shape[0], 128))

    def loss(lp, kpad):
        return jnp.sum(W * sp._sample_embed(seed, lp, kpad, d))

    with pltpu.force_tpu_interpret_mode():
        _, th, u, v = sp._sample_embed_call(seed, loc_pad, kap_pad, d)
        g = jax.grad(loss, argnums=(0, 1))(loc_pad, kap_pad)

    def loss_ref(lp, kpad):
        nu = 2.0 * (kpad + _PS_EPS) + 1.0
        w = jnp.expm1((-2.0 / nu) * jnp.log(u))
        th2 = lp + 2.0 * jnp.arctan(jnp.cos(2 * np.pi * v) * jnp.sqrt(w))
        ang = jnp.concatenate(
            [jnp.zeros((th2.shape[0], 1)), th2], -1)[:, :d]
        return jnp.sum(W[:, : 2 * d] * angles_to_torus(ang))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(loc_pad, kap_pad)
    for got, want in zip(g, g_ref):
        np.testing.assert_allclose(np.asarray(got)[:B, : d - 1],
                                   np.asarray(want)[:B, : d - 1], atol=1e-5)


_ON_TPU = jax.default_backend() == "tpu"


@pytest.mark.skipif(not _ON_TPU, reason="the TPU interpreter zeroes "
                    "pltpu.prng_random_bits (verified: all-zero draws on "
                    "CPU), so stream properties are only testable on chip; "
                    "scripts/sampler_smoke.py runs these same checks there")
def test_fused_sampler_deterministic_per_seed():
    d, B = 9, 8
    sp, seed, loc_pad, kap_pad, _ = _sampler_inputs(d, B)
    x1, *_ = sp._sample_embed_call(seed, loc_pad, kap_pad, d)
    x2, *_ = sp._sample_embed_call(seed, loc_pad, kap_pad, d)
    x3, *_ = sp._sample_embed_call(
        jnp.array([9, 9], jnp.uint32), loc_pad, kap_pad, d)
    assert np.array_equal(np.asarray(x1), np.asarray(x2))
    assert not np.array_equal(np.asarray(x1), np.asarray(x3))


@pytest.mark.skipif(not _ON_TPU, reason="hardware PRNG only (see above)")
def test_fused_sampler_distribution_moments():
    """E[cos(theta - loc)] from the hardware-PRNG stream must agree with
    the keyed-threefry XLA sampler at the same kappa (different stream,
    same distribution)."""
    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)

    d, B, kappa_val = 9, 512, 6.0
    sp, seed, loc_pad, kap_pad, loc = _sampler_inputs(d, B, kappa_val)
    _, th, _, _ = sp._sample_embed_call(seed, loc_pad, kap_pad, d)
    got = np.cos(np.asarray(th)[:B, : d - 1]
                 - np.asarray(loc_pad)[:B, : d - 1]).mean()
    dist = CliffordPowerSphericalDistribution(
        loc=loc, concentration=jnp.full((B, d), kappa_val))
    ref_x = dist.sample(jax.random.PRNGKey(11))
    from cliffordtpu.ops.torus import torus_to_angles
    ref_th = np.asarray(torus_to_angles(ref_x))
    ref = np.cos(ref_th[:, 1:] - np.asarray(loc)[:, 1:]).mean()
    assert abs(got - ref) < 0.02, (got, ref)


def test_fused_sampler_cpu_fallback_returns_none():
    """Off-TPU the public entry declines and the caller keeps the XLA
    path (the env opt-in is therefore safe to set globally)."""
    from cliffordtpu.kernels.sampler_pallas import sample_torus_fused

    loc = jax.random.uniform(KEY, (4, 9))
    out = sample_torus_fused(jax.random.PRNGKey(0), loc, jnp.full((4, 9), 3.0))
    assert out is None


def test_sampler_env_optin_dispatch(monkeypatch):
    """With CLIFFORDTPU_SAMPLER=pallas_rng set on CPU, sample() must fall
    through to the keyed path untouched (fused path declines off-TPU)."""
    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)

    loc = jax.random.uniform(KEY, (4, 9))
    dist = CliffordPowerSphericalDistribution(
        loc=loc, concentration=jnp.full((4, 9), 3.0))
    want = dist.sample(jax.random.PRNGKey(5))
    monkeypatch.setenv("CLIFFORDTPU_SAMPLER", "pallas_rng")
    got = dist.sample(jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


# ---- keyed fused sampler (in-kernel threefry, same stream) ----


@pytest.mark.parametrize("d,B", [(9, 16), (33, 7), (64, 32)])
def test_keyed_sampler_bit_exact_stream_interpret(d, B):
    """The keyed kernel's (u, v) residuals reproduce the XLA path's
    jax.random.uniform draws — same split, same partitionable counters
    (hi=0, lo=flat index), same bit-gen.  v is bit-identical; u agrees
    to the 2-ulp slack XLA's own reassociation of the minval affine
    introduces between eager and jitted uniform.  This is the whole
    point of the keyed variant (sample_torus_fused is a different
    stream)."""
    from cliffordtpu.kernels import sampler_pallas as sp
    from cliffordtpu.kernels.torus_pallas import _round_up

    key = jax.random.PRNGKey(7)
    loc = jax.random.uniform(KEY, (B, d)) * 2 * np.pi - np.pi
    kap = jax.random.uniform(jax.random.PRNGKey(1), (B, d)) * 10 + 0.5
    kp = _round_up(d - 1, 8)
    Bp = _round_up(B, 8)
    k_u, k_v = jax.random.split(key)
    seeds = jnp.concatenate([sp._raw_key_words(k_u),
                             sp._raw_key_words(k_v)])
    loc_pad = jnp.zeros((Bp, kp), jnp.float32).at[:B, : d - 1].set(
        loc[:, 1:])
    kap_pad = jnp.ones((Bp, kp), jnp.float32).at[:B, : d - 1].set(
        kap[:, 1:])
    with pltpu.force_tpu_interpret_mode():
        _, _, u, v = sp._keyed_sample_embed_call(seeds, loc_pad,
                                                 kap_pad, d)
    u_want = jax.random.uniform(k_u, (B, d), dtype=jnp.float32,
                                minval=1e-12)
    v_want = jax.random.uniform(k_v, (B, d), dtype=jnp.float32)
    # v (minval=0) is the raw mantissa float: BIT-exact.  u's affine
    # minval transform is reassociated freely by XLA itself (jitted
    # uniform != eager uniform by up to 2 ulp on this jax version —
    # see the kernel docstring), so u is pinned to <= 2 ulp.
    np.testing.assert_array_equal(np.asarray(v)[:B, : d - 1],
                                  np.asarray(v_want)[:, 1:])
    np.testing.assert_array_max_ulp(np.asarray(u)[:B, : d - 1],
                                    np.asarray(u_want)[:, 1:], maxulp=2)


@pytest.mark.parametrize("d,B", [(9, 16), (64, 32)])
def test_keyed_sampler_matches_xla_sampler_interpret(d, B):
    """End to end: the keyed fused path must reproduce the XLA sampler's
    OUTPUT (same key -> same embedding) to transcendental tolerance."""
    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)
    from cliffordtpu.kernels import sampler_pallas as sp

    key = jax.random.PRNGKey(11)
    loc = jax.random.uniform(KEY, (B, d)) * 2 * np.pi - np.pi
    kap = jax.random.uniform(jax.random.PRNGKey(2), (B, d)) * 10 + 0.5
    want = CliffordPowerSphericalDistribution(
        loc=loc, concentration=kap).sample(key)
    with pltpu.force_tpu_interpret_mode():
        got = sp._keyed_sample_torus(
            key, loc.astype(jnp.float32), kap.astype(jnp.float32), d, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_keyed_sampler_gradients_match_xla_interpret():
    """Same stream => the custom VJP can be checked against autodiff of
    the real XLA sampler directly (impossible for the hw-PRNG variant)."""
    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)
    from cliffordtpu.kernels import sampler_pallas as sp

    d, B = 9, 16
    key = jax.random.PRNGKey(13)
    loc = jax.random.uniform(KEY, (B, d)) * 2 * np.pi - np.pi
    kap = jax.random.uniform(jax.random.PRNGKey(3), (B, d)) * 10 + 0.5
    W = jax.random.normal(jax.random.PRNGKey(4), (B, 2 * d))

    def loss_ref(lc, kp_):
        d_ = CliffordPowerSphericalDistribution(loc=lc, concentration=kp_)
        return jnp.sum(W * d_.sample(key))

    def loss_keyed(lc, kp_):
        return jnp.sum(W * sp._keyed_sample_torus(
            key, lc.astype(jnp.float32), kp_.astype(jnp.float32), d, B))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(loc, kap)
    with pltpu.force_tpu_interpret_mode():
        g_got = jax.grad(loss_keyed, argnums=(0, 1))(loc, kap)
    for got, want in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)


def test_keyed_sampler_cpu_fallback_returns_none():
    """Public entry declines off-TPU, keeping the XLA path (the env
    opt-in is therefore safe to set globally)."""
    from cliffordtpu.kernels.sampler_pallas import sample_torus_fused_keyed

    loc = jax.random.uniform(KEY, (4, 9))
    assert sample_torus_fused_keyed(
        jax.random.PRNGKey(0), loc, jnp.full((4, 9), 3.0)) is None


def test_keyed_env_optin_dispatch(monkeypatch):
    """CLIFFORDTPU_SAMPLER=pallas_keyed on CPU falls through untouched."""
    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)

    loc = jax.random.uniform(KEY, (4, 9))
    dist = CliffordPowerSphericalDistribution(
        loc=loc, concentration=jnp.full((4, 9), 3.0))
    want = dist.sample(jax.random.PRNGKey(5))
    monkeypatch.setenv("CLIFFORDTPU_SAMPLER", "pallas_keyed")
    got = dist.sample(jax.random.PRNGKey(5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


# ---- fused RoPE+attention kernel (kernels/attention_pallas.py) ----


def _attn_reference(q, k, v, cos, sin):
    from cliffordtpu.nn.vit_vae import apply_rotary_half

    if cos is not None:
        q = apply_rotary_half(q, jnp.asarray(cos), jnp.asarray(sin))
        k = apply_rotary_half(k, jnp.asarray(cos), jnp.asarray(sin))
    return jax.nn.dot_product_attention(q, k, v)


def _attn_inputs(B, S, H, hd, with_rope=True, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = jax.random.normal(ks[0], (B, S, H, hd), dtype)
    k = jax.random.normal(ks[1], (B, S, H, hd), dtype)
    v = jax.random.normal(ks[2], (B, S, H, hd), dtype)
    if not with_rope:
        return q, k, v, None, None
    ang = jax.random.uniform(ks[3], (S, hd // 2), jnp.float32) * 2 * np.pi
    return q, k, v, np.cos(np.asarray(ang)), np.sin(np.asarray(ang))


@pytest.mark.parametrize("B,S,H,hd,rope", [
    (2, 13, 3, 16, True),    # ragged seq (pads 13 -> 16)
    (1, 68, 4, 64, True),    # flagship32 decoder shape
    (3, 8, 2, 8, False),     # no-RoPE path, exact sublane seq
])
def test_fused_attention_matches_xla_interpret(B, S, H, hd, rope):
    from cliffordtpu.kernels import attention_pallas as ap

    q, k, v, cos, sin = _attn_inputs(B, S, H, hd, rope)
    want = np.asarray(_attn_reference(q, k, v, cos, sin))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(ap.fused_attention(q, k, v, cos, sin))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_fused_attention_gradient_interpret():
    from cliffordtpu.kernels import attention_pallas as ap

    q, k, v, cos, sin = _attn_inputs(2, 11, 2, 16)
    w = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_ref(q, k, v):
        return jnp.sum(_attn_reference(q, k, v, cos, sin) * w)

    def loss_fused(q, k, v):
        return jnp.sum(ap.fused_attention(q, k, v, cos, sin) * w)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=3e-5, rtol=3e-5)


def test_attention_env_optin_noop_on_cpu(monkeypatch):
    """CLIFFORDTPU_ATTENTION=pallas on a non-TPU backend must leave the
    Attention module on the XLA path with identical outputs."""
    from cliffordtpu.nn.vit_vae import Attention, rope_2d_cos_sin

    cos, sin = rope_2d_cos_sin(32, 4, 16, cls_token_num=2)
    x = jax.random.normal(KEY, (2, 18, 32))
    mod = Attention(d_model=32, n_heads=2)
    params = mod.init(jax.random.PRNGKey(1), x, cos, sin)
    want = mod.apply(params, x, cos, sin)
    monkeypatch.setenv("CLIFFORDTPU_ATTENTION", "pallas")
    got = mod.apply(params, x, cos, sin)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_attention_supported_gate():
    from cliffordtpu.kernels.attention_pallas import attention_supported

    assert attention_supported((64, 68, 4, 64))         # flagship32
    assert not attention_supported((1, 68, 4, 63))      # odd head_dim
    assert not attention_supported((1, 65536, 64, 64))  # VMEM blowout
