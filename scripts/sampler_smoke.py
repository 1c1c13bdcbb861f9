"""On-chip validation of the fused hardware-PRNG sampler kernel.

The TPU interpreter zeroes ``pltpu.prng_random_bits`` (verified on CPU:
all draws come back 0), so everything stream-related about
``kernels/sampler_pallas.py`` can only be validated on real hardware.
This script runs the checks that tests/test_kernels.py gates on
``jax.default_backend() == "tpu"`` plus kappa-sweep moment agreement with
the keyed XLA sampler, and exits nonzero on any failure.

Usage (TPU solo, per CLAUDE.md):  python scripts/sampler_smoke.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    if jax.default_backend() != "tpu":
        print("SKIP: needs a TPU backend")
        return 0

    from cliffordtpu.distributions.clifford_torus import (
        CliffordPowerSphericalDistribution)
    from cliffordtpu.kernels.sampler_pallas import sample_torus_fused
    from cliffordtpu.ops.torus import angles_to_torus, torus_to_angles

    failures = []

    def check(name, ok, detail=""):
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures.append(name)

    key = jax.random.PRNGKey(42)
    d, B = 65, 256
    loc = jax.random.uniform(key, (B, d)) * 2 * np.pi - np.pi

    # 1. determinism per key + stream changes with key
    kap = jnp.full((B, d), 6.0)
    x1 = np.asarray(sample_torus_fused(jax.random.PRNGKey(1), loc, kap))
    x2 = np.asarray(sample_torus_fused(jax.random.PRNGKey(1), loc, kap))
    x3 = np.asarray(sample_torus_fused(jax.random.PRNGKey(2), loc, kap))
    check("determinism_same_key", np.array_equal(x1, x2))
    check("stream_differs_across_keys", not np.array_equal(x1, x3))

    # 2. output lands on the torus (|pair|^2 sums correctly) and angles
    #    decode to finite values
    th1 = np.asarray(torus_to_angles(jnp.asarray(x1)))
    check("finite_angles", np.isfinite(th1).all())
    recon = np.asarray(angles_to_torus(jnp.asarray(th1)))
    check("on_torus", np.abs(recon - x1).max() < 1e-4,
          f"max={np.abs(recon - x1).max():.2e}")

    # 3. kappa-sweep moment agreement with the keyed XLA sampler:
    #    E[cos(theta-loc)] and E[cos 2(theta-loc)] (resultant lengths)
    for kv in (0.5, 6.0, 50.0, 2000.0):
        kap = jnp.full((B, d), kv)
        n_rep = 40
        gots, refs = [], []
        for r in range(n_rep):
            kk = jax.random.fold_in(jax.random.PRNGKey(100), r)
            xf = sample_torus_fused(kk, loc, kap)
            tf_ = np.asarray(torus_to_angles(xf))[:, 1:]
            gots.append(np.cos(tf_ - np.asarray(loc)[:, 1:]))
            dist = CliffordPowerSphericalDistribution(
                loc=loc, concentration=kap)
            xr = dist.sample(jax.random.fold_in(jax.random.PRNGKey(200), r))
            tr = np.asarray(torus_to_angles(xr))[:, 1:]
            refs.append(np.cos(tr - np.asarray(loc)[:, 1:]))
        got, ref = np.mean(gots), np.mean(refs)
        # n = 256*64*40 ≈ 650k draws -> se ~ 1e-3; tolerance 6 sigma-ish
        check(f"moment_kappa_{kv}", abs(got - ref) < 8e-3,
              f"got={got:.5f} ref={ref:.5f}")

    # 4. reparam gradients: finite, and dkappa direction sane (higher
    #    kappa concentrates samples -> moves embedding toward loc's)
    def loss(lc, kp_):
        x = sample_torus_fused(jax.random.PRNGKey(3), lc, kp_)
        tgt = angles_to_torus(lc)
        return jnp.mean((x - tgt) ** 2)

    gl, gk = jax.grad(loss, argnums=(0, 1))(loc, jnp.full((B, d), 4.0))
    check("grad_finite",
          bool(np.isfinite(np.asarray(gl)).all()
               and np.isfinite(np.asarray(gk)).all()))
    check("dkappa_reduces_spread", float(np.asarray(gk)[:, 1:].mean()) < 0)

    # 5. env-var dispatch inside a jitted step (trace-time env read)
    import os

    os.environ["CLIFFORDTPU_SAMPLER"] = "pallas_rng"
    try:
        dist = CliffordPowerSphericalDistribution(
            loc=loc, concentration=jnp.full((B, d), 6.0))

        @jax.jit
        def step(k):
            return dist.sample(k).sum()

        v1 = float(step(jax.random.PRNGKey(5)))
        check("jit_dispatch_finite", np.isfinite(v1))
    finally:
        del os.environ["CLIFFORDTPU_SAMPLER"]

    print(f"{len(failures)} failures" if failures else "ALL PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
