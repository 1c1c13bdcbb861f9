"""MLP VAE for MNIST — flax.linen rebuild of ``mnist/mlp_vae.py:19-104``.

Same capacity and head activations as the reference:
  encoder 784-256-128 (ReLU), heads per latent family, decoder
  128-256-784 logits with input dim 2*z_dim for the clifford family
  (``mlp_vae.py:40``); Xavier-uniform weights, zero biases (``:49-55``).

Head activations replicated exactly (``:57-71``):
  normal:          mean (optionally L2-normalized), logvar head
  powerspherical / vmf:  mean L2-normalized; kappa = clamp(softplus + 0.8, <= 10)
  clifford:        mean = raw angles; kappa = clamp(softplus + 0.03, <= 10)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from cliffordtpu.nn.reparam import reparameterize, sample_latent

_XAVIER = nn.initializers.xavier_uniform()


def l2_normalize(x, eps=1e-12):
    """torch.nn.functional.normalize semantics: x / max(||x||, eps)."""
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True), min=eps)


class MLPVAE(nn.Module):
    h_dim: int  # kept for signature parity; the reference hardcodes 256/128
    z_dim: int
    distribution: str = "normal"
    l2_normalize: bool = False

    def setup(self):
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, kernel_init=_XAVIER, bias_init=nn.initializers.zeros, name=name
        )
        self.enc1 = dense(256, "enc1")
        self.enc2 = dense(128, "enc2")
        self.fc_mean = dense(self.z_dim, "fc_mean")
        if self.distribution == "normal":
            self.fc_var = dense(self.z_dim, "fc_var")
        else:
            self.fc_scale = dense(1, "fc_scale")
        self.dec1 = dense(128, "dec1")
        self.dec2 = dense(256, "dec2")
        self.dec3 = dense(784, "dec3")

    def encode(self, x):
        h = nn.relu(self.enc2(nn.relu(self.enc1(x))))
        if self.distribution == "normal":
            z_mean = self.fc_mean(h)
            if self.l2_normalize:
                z_mean = l2_normalize(z_mean)
            return z_mean, self.fc_var(h)
        elif self.distribution in ("powerspherical", "vmf"):
            z_mean = l2_normalize(self.fc_mean(h))
            z_scale = jnp.clip(nn.softplus(self.fc_scale(h)) + 0.8, max=10.0)
            return z_mean, z_scale
        else:  # clifford
            z_mean_angles = self.fc_mean(h)
            z_scale = jnp.clip(nn.softplus(self.fc_scale(h)) + 0.03, max=10.0)
            return z_mean_angles, z_scale

    def decode(self, z):
        return self.dec3(nn.relu(self.dec2(nn.relu(self.dec1(z)))))

    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        z_mean, z_param2 = self.encode(x)
        q_z, p_z = reparameterize(
            self.distribution, z_mean, z_param2, self.z_dim
        )
        z = sample_latent(
            self.make_rng("sample"), self.distribution, q_z, self.l2_normalize
        )
        x_recon = self.decode(z)
        return (z_mean, z_param2), (q_z, p_z), z, x_recon

    def get_flat_latent(self, x):
        """Encode + sample, flat latent for VSA tests."""
        x = x.reshape(x.shape[0], -1)
        z_mean, z_param2 = self.encode(x)
        q_z, _ = reparameterize(self.distribution, z_mean, z_param2, self.z_dim)
        return sample_latent(
            self.make_rng("sample"), self.distribution, q_z, self.l2_normalize
        )
