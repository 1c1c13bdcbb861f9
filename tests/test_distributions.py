"""Unit tests for the distribution layer: moments, normalization by
quadrature, KL identities, gradient flow — the test strategy designed in
SURVEY.md §4 (the reference has no tests of its own)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.special
import scipy.stats

from cliffordtpu.distributions import (
    CliffordPowerSphericalDistribution,
    CliffordTorusDistribution,
    CliffordTorusUniform,
    HypersphericalUniform,
    Normal,
    PowerSpherical,
    VMFHypersphericalUniform,
    VonMisesFisher,
    kl_divergence,
)
from cliffordtpu.distributions.bessel import (
    ive,
    ive_fraction_approx2,
    log_ive,
    von_mises_entropy,
)

KEY = jax.random.PRNGKey(42)


# ---------------- bessel ----------------


@pytest.mark.parametrize("v", [0.0, 0.5, 1.0, 2.5, 10.0, 19.5])
def test_log_ive_vs_scipy(v):
    z = np.linspace(0.05, 12.0, 25)
    ours = np.asarray(log_ive(v, jnp.asarray(z, jnp.float32)))
    ref = np.log(scipy.special.ive(v, z.astype(np.float64)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_ive_fraction_approx2_accuracy():
    # ratio I_v(z) / I_{v-1}(z) for v = m/2
    for m in [5, 11, 41]:
        v = m / 2.0
        z = np.linspace(0.5, 10.0, 10)
        approx = np.asarray(
            ive_fraction_approx2(jnp.asarray(v), jnp.asarray(z, jnp.float32))
        )
        exact = scipy.special.ive(v, z) / scipy.special.ive(v - 1, z)
        # approx2 is itself a ~1%-tight bound (the reference uses the same)
        np.testing.assert_allclose(approx, exact, rtol=1e-2)


def test_von_mises_entropy_vs_scipy():
    kappa = np.array([0.05, 0.5, 1.0, 3.0, 9.9], np.float32)
    ours = np.asarray(von_mises_entropy(jnp.asarray(kappa)))
    ref = scipy.stats.vonmises(kappa).entropy()
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# ---------------- hyperspherical uniforms ----------------


def test_hyperspherical_uniform_logprob_is_neg_log_area():
    for dim in [2, 3, 5, 10]:
        u = HypersphericalUniform(dim)
        x = u.sample(KEY, (4,))
        # surface area of S^{dim-1}: 2 pi^{d/2} / Gamma(d/2)
        log_area = (
            math.log(2)
            + (dim / 2) * math.log(math.pi)
            - math.lgamma(dim / 2)
        )
        np.testing.assert_allclose(
            np.asarray(u.log_prob(x)), -log_area, atol=1e-6
        )
        np.testing.assert_allclose(u.entropy(), log_area, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-4
        )


def test_vmf_uniform_convention():
    # VMFHypersphericalUniform(dim=d) lives in R^{d+1}
    u = VMFHypersphericalUniform(4)
    x = u.sample(KEY, (3,))
    assert x.shape == (3, 5)
    # S^4 area check
    log_area = math.log(2) + 2.5 * math.log(math.pi) - math.lgamma(2.5)
    np.testing.assert_allclose(u.entropy(), log_area, atol=1e-6)


# ---------------- power spherical ----------------


def test_ps_samples_on_sphere():
    loc = jnp.asarray([0.0, 0.0, 1.0])
    ps = PowerSpherical(loc, jnp.asarray(5.0))
    x = ps.sample(KEY, (1000,))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-4
    )


def test_ps_mean_direction():
    """E[x] = loc * E[t]; E[t] = (a - b)/(a + b) for t = 2 Beta(a,b) - 1."""
    d, kappa = 5, 8.0
    loc = np.zeros(d, np.float32)
    loc[0], loc[2] = 0.6, 0.8
    ps = PowerSpherical(jnp.asarray(loc), jnp.asarray(kappa))
    x = np.asarray(ps.sample(KEY, (200_000,)))
    a = (d - 1) / 2 + kappa
    b = (d - 1) / 2
    expected = loc * (a - b) / (a + b)
    np.testing.assert_allclose(x.mean(0), expected, atol=5e-3)


def test_ps_log_prob_normalizes_on_circle():
    """Quadrature on S^1: integral of exp(log_prob) over the circle = 1."""
    theta = np.linspace(-np.pi, np.pi, 20001)[:-1]
    pts = jnp.asarray(np.stack([np.cos(theta), np.sin(theta)], -1), jnp.float32)
    loc = jnp.asarray([np.cos(0.7), np.sin(0.7)], jnp.float32)
    for kappa in [0.1, 1.0, 7.0]:
        ps = PowerSpherical(loc, jnp.asarray(kappa, jnp.float32))
        lp = np.asarray(ps.log_prob(pts), np.float64)
        integral = np.exp(lp).mean() * 2 * np.pi
        np.testing.assert_allclose(integral, 1.0, rtol=2e-3)


def test_ps_entropy_matches_monte_carlo():
    loc = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    kappa = jnp.asarray(4.0)
    ps = PowerSpherical(loc, kappa)
    x = ps.sample(KEY, (100_000,))
    mc_entropy = -np.asarray(ps.log_prob(x)).mean()
    np.testing.assert_allclose(float(ps.entropy()), mc_entropy, rtol=1e-2)


def test_ps_kl_to_uniform_nonneg_and_mc():
    loc = jnp.asarray([0.0, 1.0, 0.0])
    for kappa in [0.5, 3.0]:
        ps = PowerSpherical(loc, jnp.asarray(kappa))
        u = HypersphericalUniform(3)
        kl = float(kl_divergence(ps, u))
        assert kl >= 0
        x = ps.sample(KEY, (100_000,))
        mc = np.asarray(ps.log_prob(x) - u.log_prob(x)).mean()
        np.testing.assert_allclose(kl, mc, rtol=2e-2, atol=5e-3)


def test_ps_rsample_gradients():
    def loss(kappa, loc):
        ps = PowerSpherical(loc, kappa)
        x = ps.sample(jax.random.PRNGKey(0), (64,))
        return jnp.mean(jnp.sum(x * jnp.asarray([1.0, 1.0, 0.0]), -1))

    loc = jnp.asarray([0.0, 1.0, 0.0])
    g_kappa = jax.grad(loss)(jnp.asarray(3.0), loc)
    g_loc = jax.grad(loss, argnums=1)(jnp.asarray(3.0), loc)
    assert np.isfinite(float(g_kappa)) and abs(float(g_kappa)) > 0
    assert np.all(np.isfinite(np.asarray(g_loc)))


# ---------------- clifford torus ----------------


def test_clifford_uniform_entropy_and_samples():
    d = 8
    u = CliffordTorusUniform(d)
    x = u.sample(KEY, (16,))
    assert x.shape == (16, 2 * d)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-4
    )
    np.testing.assert_allclose(
        u.entropy(), (d - 1) * math.log(2 * math.pi), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(u.log_prob(x)), -u.entropy(), atol=1e-5
    )


def test_clifford_ps_sample_shape_and_norm():
    d = 6
    loc = jax.random.uniform(KEY, (3, d)) * 2 * np.pi
    kappa = jnp.full((3, d), 2.0)
    q = CliffordPowerSphericalDistribution(loc, kappa)
    z = q.sample(KEY, (5,))
    assert z.shape == (5, 3, 2 * d)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-4
    )


def test_clifford_ps_phase_concentration():
    """High kappa -> recovered angles concentrate around loc (free circles)."""
    from cliffordtpu.ops.torus import torus_to_angles, wrap_angle

    d = 5
    loc = jnp.asarray(np.linspace(-2.0, 2.0, d), jnp.float32)[None, :]
    kappa = jnp.full((1, d), 50.0)
    q = CliffordPowerSphericalDistribution(loc, kappa)
    z = q.sample(KEY, (2000,))
    rec = torus_to_angles(z)
    err = np.asarray(wrap_angle(rec[..., 1:] - loc[..., 1:]))
    assert np.abs(err).mean() < 0.2


def test_clifford_ps_entropy_vs_mc():
    """-E[log q] over free circles == entropy (log_prob includes circle 0,
    but with loc_0 matched the pinned-circle term's MC mean equals its own
    entropy contribution; instead test on the free-circle sum directly)."""
    d = 4
    loc = jnp.asarray([[0.3, -1.0, 0.5, 2.0]], jnp.float32)
    kappa = jnp.full((1, d), 3.0, jnp.float32)
    q = CliffordPowerSphericalDistribution(loc, kappa)

    # Monte Carlo entropy of the free circles via per-circle PS log_prob
    from cliffordtpu.distributions.power_spherical import PowerSpherical
    from cliffordtpu.ops.torus import torus_to_angles

    z = q.sample(KEY, (100_000,))
    ang = torus_to_angles(z)
    mean_dirs = jnp.stack([jnp.cos(loc), jnp.sin(loc)], -1)
    vecs = jnp.stack([jnp.cos(ang), jnp.sin(ang)], -1)
    ps = PowerSpherical(mean_dirs, kappa)
    lp_free = np.asarray(ps.log_prob(vecs))[..., 1:].sum(-1)
    np.testing.assert_allclose(
        float(q.entropy()[0]), -lp_free.mean(), rtol=2e-2
    )


def test_clifford_ps_kl_identity():
    d = 6
    loc = jax.random.uniform(KEY, (4, d)) * 2 * np.pi
    kappa = jnp.full((4, d), 1.5)
    q = CliffordPowerSphericalDistribution(loc, kappa)
    p = CliffordTorusUniform(d)
    kl = np.asarray(kl_divergence(q, p))
    assert kl.shape == (4,)
    assert np.all(kl >= -1e-5)
    # KL -> 0 as kappa -> 0 (entropy of q approaches uniform entropy)
    q0 = CliffordPowerSphericalDistribution(loc, jnp.full((4, d), 1e-6))
    np.testing.assert_allclose(
        np.asarray(kl_divergence(q0, p)), 0.0, atol=2e-2
    )


def test_clifford_ps_rsample_gradients():
    d = 5

    def loss(loc, kappa):
        q = CliffordPowerSphericalDistribution(loc, kappa)
        z = q.sample(jax.random.PRNGKey(1), (32,))
        return jnp.mean(z[..., 0])

    loc = jnp.zeros((2, d))
    kappa = jnp.full((2, d), 2.0)
    g_loc, g_kappa = jax.grad(loss, argnums=(0, 1))(loc, kappa)
    assert np.all(np.isfinite(np.asarray(g_loc)))
    assert np.all(np.isfinite(np.asarray(g_kappa)))
    assert np.abs(np.asarray(g_kappa)).sum() > 0


def test_clifford_vm_distribution():
    d = 4
    loc = jnp.asarray([[0.5, 1.0, -0.5, 2.0]])
    kappa = jnp.full((1, d), 4.0)
    q = CliffordTorusDistribution(loc, kappa)
    z = q.sample(KEY, (100,))
    assert z.shape == (100, 1, 2 * d)
    ent = float(q.entropy()[0])
    # entropy of product of d-1 free von Mises circles
    ref = scipy.stats.vonmises(4.0).entropy() * (d - 1)
    np.testing.assert_allclose(ent, ref, rtol=1e-3)
    kl = kl_divergence(q, CliffordTorusUniform(d))
    assert float(kl[0]) >= 0


# ---------------- vMF ----------------


def test_vmf_samples_on_sphere_and_mean():
    m, kappa = 5, 6.0
    loc = np.zeros(m, np.float32)
    loc[1] = 1.0
    q = VonMisesFisher(jnp.asarray(loc), jnp.asarray([kappa], jnp.float32))
    x = np.asarray(q.sample(KEY, (100_000,)))
    np.testing.assert_allclose(np.linalg.norm(x, axis=-1), 1.0, atol=1e-4)
    # E[x] = loc * I_{m/2}(k)/I_{m/2-1}(k)
    ratio = scipy.special.ive(m / 2, kappa) / scipy.special.ive(m / 2 - 1, kappa)
    np.testing.assert_allclose(x.mean(0), loc * ratio, atol=5e-3)


def test_vmf_m3_closed_form():
    loc = jnp.asarray([0.0, 0.0, 1.0])
    q = VonMisesFisher(loc, jnp.asarray([4.0]))
    x = np.asarray(q.sample(KEY, (100_000,)))
    ratio = scipy.special.ive(1.5, 4.0) / scipy.special.ive(0.5, 4.0)
    np.testing.assert_allclose(x.mean(0)[2], ratio, atol=5e-3)


def test_vmf_log_prob_normalizes_s2():
    """MC normalization check on S^2 with uniform proposals."""
    loc = jnp.asarray([1.0, 0.0, 0.0])
    q = VonMisesFisher(loc, jnp.asarray([3.0]))
    u = HypersphericalUniform(3)
    pts = u.sample(KEY, (200_000,))
    lp = np.asarray(q.log_prob(pts), np.float64)
    area = 4 * np.pi
    integral = np.exp(lp).mean() * area
    np.testing.assert_allclose(integral, 1.0, rtol=2e-2)


def test_vmf_entropy_mc():
    loc = jnp.asarray([0.0, 1.0, 0.0, 0.0, 0.0])
    q = VonMisesFisher(loc, jnp.asarray([5.0]))
    x = q.sample(KEY, (100_000,))
    mc = -np.asarray(q.log_prob(x)).mean()
    np.testing.assert_allclose(float(q.entropy()), mc, rtol=1e-2)


def test_vmf_kl_uniform():
    loc = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    q = VonMisesFisher(loc, jnp.asarray([2.0]))
    p = VMFHypersphericalUniform(3)  # S^3 in R^4 — caller passes z_dim-1
    kl = float(kl_divergence(q, p))
    assert kl >= 0
    x = q.sample(KEY, (100_000,))
    mc = np.asarray(q.log_prob(x) - p.log_prob(x)).mean()
    # entropy (and hence KL) uses the ive_fraction_approx2 bound like the
    # reference (von_mises_fisher.py:183-191) -> a few-% bias vs exact MC
    np.testing.assert_allclose(kl, mc, rtol=5e-2)


def test_vmf_scale_gradient():
    def loss(kappa):
        q = VonMisesFisher(jnp.asarray([0.0, 0.0, 0.0, 1.0]), kappa)
        x = q.sample(jax.random.PRNGKey(2), (256,))
        return jnp.mean(x[..., 3])

    g = jax.grad(loss)(jnp.asarray([3.0]))
    assert np.isfinite(float(g[0]))
    assert abs(float(g[0])) > 1e-5  # grads flow through b(scale) -> w


# ---------------- normal ----------------


def test_normal_kl_closed_form():
    q = Normal(jnp.asarray([0.5]), jnp.asarray([2.0]))
    p = Normal(jnp.asarray([0.0]), jnp.asarray([1.0]))
    kl = float(kl_divergence(q, p)[0])
    expected = 0.5 * (4.0 + 0.25 - 1.0 - math.log(4.0))
    np.testing.assert_allclose(kl, expected, rtol=1e-6)


# ---------------- jit / vmap sanity ----------------


def test_distributions_jit_and_vmap():
    d = 4

    @jax.jit
    def step(key, loc, kappa):
        q = CliffordPowerSphericalDistribution(loc, kappa)
        z = q.sample(key)
        return z, q.entropy()

    loc = jax.random.uniform(KEY, (8, d))
    kappa = jnp.full((8, d), 2.0)
    z, ent = step(KEY, loc, kappa)
    assert z.shape == (8, 2 * d) and ent.shape == (8,)

    # vmap over a batch of distributions
    zs = jax.vmap(lambda l, k: PowerSpherical(l, k).sample(KEY))(
        jax.random.normal(KEY, (6, 3)), jnp.full((6,), 2.0)
    )
    assert zs.shape == (6, 3)


def test_beta_half_sample_matches_beta_distribution():
    """The single-Gamma + chi^2 Beta construction (sampling hot path) must
    reproduce Beta(a, n/2) moments, and carry gradients w.r.t. alpha."""
    from cliffordtpu.distributions.power_spherical import beta_half_sample

    key = jax.random.PRNGKey(5)
    for a, n_half in [(0.53, 1), (2.0, 1), (5.0, 4), (1.5, 257)]:
        b = n_half / 2.0
        s = beta_half_sample(key, jnp.float32(a), n_half, (120000,))
        mean = float(s.mean())
        var = float(s.var())
        exp_mean = a / (a + b)
        exp_var = a * b / ((a + b) ** 2 * (a + b + 1))
        assert abs(mean - exp_mean) < 4e-3, (a, n_half, mean, exp_mean)
        assert abs(var - exp_var) < 4e-3, (a, n_half, var, exp_var)

    # implicit-reparameterization gradient through alpha is finite, nonzero
    g = jax.grad(
        lambda a: beta_half_sample(key, a, 1, (256,)).mean()
    )(jnp.float32(2.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 1e-6


def test_clifford_ps_fast_path_distribution():
    """The inlined d=2 sampler in CliffordPowerSphericalDistribution.sample
    must match the generic PowerSpherical construction: wrapped-phase
    moments of cos(theta - loc) equal the PS marginal-t mean a/(a+b)."""
    d = 6
    loc = jnp.linspace(-2.0, 2.0, d)
    kappa = jnp.full((d,), 4.0)
    dist = CliffordPowerSphericalDistribution(loc, kappa)
    key = jax.random.PRNGKey(9)
    x = dist.sample(key, (4000,))
    assert x.shape == (4000, 2 * d)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-4)
    from cliffordtpu.ops.torus import torus_to_angles

    theta = np.asarray(torus_to_angles(x))
    a = 4.0 + 0.5 + 1e-7
    exp_cos = 2 * (a / (a + 0.5)) - 1  # E[t] = 2 E[Beta] - 1
    got = np.cos(theta[:, 1:] - np.asarray(loc)[1:]).mean(0)
    np.testing.assert_allclose(got, exp_cos, atol=0.02)
    # angle 0 pinned: theta_0 == 0 regardless of loc/kappa
    np.testing.assert_allclose(theta[:, 0], 0.0, atol=1e-5)

    # reparameterized: d loss / d kappa is finite and nonzero.  (The loss
    # must not be the plain sum: the torus embedding's entries always sum
    # to exactly 1 — the DFT row-sum picks out the constant mode — so
    # sum() has zero gradient for ANY sampler.)
    g = jax.grad(
        lambda k: (CliffordPowerSphericalDistribution(loc, k)
                   .sample(key, (64,)) ** 2)[..., : d].sum()
    )(kappa)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 1e-6


def test_fixed_budget_gamma_matches_gamma():
    """The while-free K-proposal Marsaglia-Tsang sampler (train-step hot
    path) must reproduce Gamma(a,1) moments across the boost boundary and
    carry the same implicit-reparameterization gradient (E[z]=a so
    d mean / d a == 1) as jax.random.gamma."""
    from cliffordtpu.distributions.gamma import gamma_sample

    key = jax.random.PRNGKey(2)
    for a in (0.3, 0.50000012, 1.0, 4.0, 20.0):
        s = gamma_sample(key, jnp.float32(a), (200000,))
        assert float(s.min()) > 0
        assert abs(float(s.mean()) - a) < 0.03 * max(1, a)
        assert abs(float(s.var()) - a) < 0.06 * max(1, a)

    for a in (0.6, 2.0):
        g = jax.grad(
            lambda al: gamma_sample(key, al, (4096,)).mean()
        )(jnp.float32(a))
        assert np.isfinite(float(g)) and abs(float(g) - 1.0) < 0.1, (a, g)
