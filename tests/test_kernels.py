"""Pallas kernel tests — run in interpret mode on CPU (the real-TPU path is
exercised by bench.py); correctness vs the pure-jnp reference ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

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
