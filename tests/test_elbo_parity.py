"""ELBO parity: copy reference torch MLPVAE weights into the flax model and
assert every deterministic piece of the loss matches to float32 tolerance
(BASELINE.md's 1e-3/dim target is enforced at 1e-4 here).

The only stochastic piece (the latent draw) is already validated
distribution-level in test_reference_parity.py; here we fix z."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    sys.path.insert(0, os.path.join(REF, "vmf"))
    import torch
    import torch.nn.functional as TF

    from mnist.mlp_vae import MLPVAE as TorchMLPVAE

from cliffordtpu.nn import MLPVAE
from cliffordtpu.nn.losses import bce_with_logits, vae_loss_from_outputs
from cliffordtpu.nn.reparam import reparameterize
from cliffordtpu.distributions import kl_divergence


def _copy_weights(tm, params, distribution):
    """torch state_dict -> flax params (kernel = weight.T)."""
    from cliffordtpu.utils.torch_interop import (
        copy_mlp_weights,
        torch_state_dict_to_numpy,
    )

    return copy_mlp_weights(torch_state_dict_to_numpy(tm), params,
                            distribution)


@pytest.mark.parametrize("dist", ["normal", "powerspherical", "vmf",
                                  "clifford"])
def test_mlp_forward_parity(dist):
    torch.manual_seed(0)
    z_dim = 8
    tm = TorchMLPVAE(h_dim=128, z_dim=z_dim, distribution=dist)
    jm = MLPVAE(h_dim=128, z_dim=z_dim, distribution=dist)
    key = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(0).uniform(
        0, 1, (16, 784)).astype(np.float32)
    params = jm.init({"params": key, "sample": key},
                     jnp.asarray(x_np))["params"]
    params = _copy_weights(tm, params, dist)

    # 1) encoder heads match
    with torch.no_grad():
        t_mean, t_p2 = tm.encode(torch.tensor(x_np))
    j_mean, j_p2 = jm.apply({"params": params}, jnp.asarray(x_np),
                            method=jm.encode)
    np.testing.assert_allclose(np.asarray(j_mean), t_mean.numpy(),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(j_p2), t_p2.numpy(),
                               atol=2e-5, rtol=1e-5)

    # 2) decoder matches on a fixed z
    dec_dim = 2 * z_dim if dist == "clifford" else z_dim
    z_np = np.random.default_rng(1).normal(
        size=(16, dec_dim)).astype(np.float32)
    with torch.no_grad():
        t_rec = tm.decoder(torch.tensor(z_np)).numpy()
    j_rec = jm.apply({"params": params}, jnp.asarray(z_np),
                     method=jm.decode)
    np.testing.assert_allclose(np.asarray(j_rec), t_rec, atol=2e-4,
                               rtol=1e-4)

    # 3) KL / entropy from the same encoder outputs match
    q_z, p_z = reparameterize(dist, j_mean, j_p2, z_dim)
    j_kl = float(kl_divergence(q_z, p_z).mean())
    with torch.no_grad():
        tq, tp = tm.reparameterize(t_mean, t_p2)
        t_kl = float(torch.distributions.kl.kl_divergence(tq, tp)
                     .mean().item())
    per_dim_tol = 1e-4 * z_dim
    assert abs(j_kl - t_kl) < max(1e-3, per_dim_tol), (j_kl, t_kl)

    # 4) BCE matches
    logits = np.random.default_rng(2).normal(
        size=(16, 784)).astype(np.float32)
    t_bce = float(TF.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(x_np), reduction="sum") / 16)
    j_bce = float(bce_with_logits(jnp.asarray(logits),
                                  jnp.asarray(x_np)).sum() / 16)
    np.testing.assert_allclose(j_bce, t_bce, rtol=1e-5)


def test_full_loss_parity_with_fixed_z():
    """End-to-end vae_loss match when the sampled z is pinned to the same
    values in both frameworks (clifford family)."""
    torch.manual_seed(0)
    z_dim = 6
    dist = "clifford"
    tm = TorchMLPVAE(h_dim=128, z_dim=z_dim, distribution=dist)
    jm = MLPVAE(h_dim=128, z_dim=z_dim, distribution=dist)
    key = jax.random.PRNGKey(0)
    x_np = np.random.default_rng(0).uniform(0, 1, (8, 784)) > 0.5
    x_np = x_np.astype(np.float32)
    params = jm.init({"params": key, "sample": key},
                     jnp.asarray(x_np))["params"]
    params = _copy_weights(tm, params, dist)

    # torch side
    with torch.no_grad():
        t_mean, t_p2 = tm.encode(torch.tensor(x_np))
        tq, tp = tm.reparameterize(t_mean, t_p2)
        t_z = tq.rsample()
        t_rec = tm.decoder(t_z)
        t_recon = float(TF.binary_cross_entropy_with_logits(
            t_rec, torch.tensor(x_np), reduction="sum") / 8)
        t_kl = float(torch.distributions.kl.kl_divergence(tq, tp).mean())
        t_total = t_recon + t_kl

    # jax side with the SAME z
    j_mean, j_p2 = jm.apply({"params": params}, jnp.asarray(x_np),
                            method=jm.encode)
    q_z, p_z = reparameterize(dist, j_mean, j_p2, z_dim)
    z = jnp.asarray(t_z.numpy())
    j_rec = jm.apply({"params": params}, z, method=jm.decode)
    outputs = ((j_mean, j_p2), (q_z, p_z), z, j_rec)
    losses = vae_loss_from_outputs(jnp.asarray(x_np), outputs, beta=1.0)
    np.testing.assert_allclose(float(losses["recon"]), t_recon, rtol=1e-4)
    np.testing.assert_allclose(float(losses["kl"]), t_kl, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(losses["total"]), t_total, rtol=1e-4)
