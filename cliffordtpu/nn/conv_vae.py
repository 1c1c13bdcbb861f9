"""ResNet CNN VAE — flax rebuild of ``cnn/models.py:18-315``.

NHWC layout throughout (TPU-native; the reference is NCHW torch).  Blocks:

* ``ResBlock``    — 4x4 stride-2 conv + LeakyReLU(0.2), avg-pool 1x1-conv skip
  (``cnn/models.py:18-27``)
* ``ResUpBlock``  — 4x4 stride-2 transposed conv + LeakyReLU, nearest-upsample
  1x1-conv skip (``:30-39``)

Encoder/Decoder channel stacks and head activations follow ``:42-131``; the
clifford concentration-floor schedule by latent dim follows ``:157-166``; the
loss (l1|mse sum/B + beta*KL, optional learnable-beta L-VAE form) follows
``:247-315``.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from cliffordtpu.nn.mlp_vae import l2_normalize
from cliffordtpu.nn.reparam import reparameterize, sample_latent

_XAVIER = nn.initializers.xavier_uniform()


def clifford_concentration_floor(latent_dim: int) -> float:
    """kappa floor scaled with dim (``cnn/models.py:157-166``)."""
    if latent_dim < 256:
        return 0.04
    elif latent_dim <= 512:
        return 0.07
    elif latent_dim <= 1024:
        return 0.10
    elif latent_dim <= 2048:
        return 0.13
    return 0.16


class ResBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_ch, (4, 4), strides=(2, 2),
                    padding=((1, 1), (1, 1)), kernel_init=_XAVIER,
                    dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        skip = x
        if x.shape[-1] != self.out_ch:
            skip = nn.Conv(self.out_ch, (1, 1), kernel_init=_XAVIER,
                           dtype=self.dtype)(skip)
        skip = nn.avg_pool(skip, (2, 2), strides=(2, 2))
        return h + skip


class ResUpBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.ConvTranspose(self.out_ch, (4, 4), strides=(2, 2),
                             padding="SAME", kernel_init=_XAVIER,
                             dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        skip = x
        if x.shape[-1] != self.out_ch:
            skip = nn.Conv(self.out_ch, (1, 1), kernel_init=_XAVIER,
                           dtype=self.dtype)(skip)
        B, H, W, C = skip.shape
        skip = jax.image.resize(skip, (B, 2 * H, 2 * W, C), "nearest")
        return h + skip


class Encoder(nn.Module):
    """``cnn/models.py:42-97``."""

    latent_dim: int
    distribution: str
    l2_normalize: bool = False
    concentration_floor: float = 0.1
    img_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        chs = [64, 128, 256, 512, 512] if self.img_size == 64 else [64, 128, 256, 512]
        for ch in chs:
            x = ResBlock(ch, dtype=self.dtype)(x)
        # heads stay f32 (distribution numerics)
        x = x.astype(jnp.float32).reshape(x.shape[0], -1)  # 512*2*2
        mu = nn.Dense(self.latent_dim, kernel_init=_XAVIER)(x)
        if self.distribution == "gaussian":
            if self.l2_normalize:
                mu = l2_normalize(mu)
            log_var = nn.Dense(self.latent_dim, kernel_init=_XAVIER)(x)
            return mu, log_var
        kappa_raw = nn.Dense(1, kernel_init=_XAVIER)(x)
        if self.distribution == "powerspherical":
            mu = l2_normalize(mu)
            kappa = jnp.clip(nn.softplus(kappa_raw) + 0.5, max=10.0)
            return mu, kappa
        elif self.distribution == "clifford":
            kappa = jnp.clip(
                nn.softplus(kappa_raw) + self.concentration_floor, max=10.0
            )
            return mu, kappa
        raise ValueError(self.distribution)


class Decoder(nn.Module):
    """``cnn/models.py:100-131``."""

    out_channels: int
    img_size: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        x = nn.Dense(512 * 2 * 2, kernel_init=_XAVIER, dtype=self.dtype)(z)
        x = x.reshape(z.shape[0], 2, 2, 512)
        chs = [512, 256, 128, 64] if self.img_size == 64 else [256, 128, 64]
        for ch in chs:
            x = ResUpBlock(ch, dtype=self.dtype)(x)
        # output conv + tanh in f32 (recon loss numerics)
        x = nn.ConvTranspose(self.out_channels, (4, 4), strides=(2, 2),
                             padding="SAME", kernel_init=_XAVIER)(
            x.astype(jnp.float32))
        return nn.tanh(x)


class CNNVAE(nn.Module):
    """``cnn/models.py:134-315`` (named VAE there)."""

    latent_dim: int
    in_channels: int
    distribution: str
    recon_loss_type: str = "l1"
    l1_weight: float = 1.0
    l2_normalize: bool = False
    concentration_floor: float = 0.05
    img_size: int = 32
    use_learnable_beta: bool = False
    dtype: Any = jnp.float32  # compute dtype for conv stacks (bf16 for TPU
    # throughput; heads, sampling and loss stay f32)

    def setup(self):
        floor = self.concentration_floor
        if self.distribution == "clifford":
            floor = clifford_concentration_floor(self.latent_dim)
        self.floor = floor
        self.encoder = Encoder(
            self.latent_dim,
            distribution=self.distribution,
            l2_normalize=self.l2_normalize,
            concentration_floor=floor,
            img_size=self.img_size,
            dtype=self.dtype,
        )
        self.decoder = Decoder(self.in_channels, img_size=self.img_size,
                               dtype=self.dtype)
        if self.use_learnable_beta:
            self.log_sigma_0 = self.param(
                "log_sigma_0", nn.initializers.zeros, (1,))
            self.log_sigma_1 = self.param(
                "log_sigma_1", nn.initializers.zeros, (1,))

    def encode(self, x):
        return self.encoder(x)

    # eval-adapter alias (images in, heads out) shared with per-token models
    def encode_heads(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def reparam(self, mu, params):
        """``cnn/models.py:211-233``: build (q_z, p_z) and sample."""
        if self.distribution == "clifford":
            # kappa (B, 1) broadcast across dims (``:228``)
            params = jnp.broadcast_to(params, mu.shape)
        q_z, p_z = reparameterize(
            self.distribution, mu, params, self.latent_dim
        )
        z = sample_latent(
            self.make_rng("sample"), self.distribution, q_z, self.l2_normalize
        )
        return z, q_z, p_z

    def __call__(self, x):
        mu, params = self.encoder(x)
        z, q_z, p_z = self.reparam(mu, params)
        x_recon = self.decoder(z)
        return x_recon, q_z, p_z, mu

    def get_flat_latent(self, x):
        mu, params = self.encoder(x)
        z, _, _ = self.reparam(mu, params)
        return z

    def loss_sigmas(self):
        if self.use_learnable_beta:
            return jnp.exp(self.log_sigma_0), jnp.exp(self.log_sigma_1)
        return None, None


def cnn_vae_loss(x, x_recon, q_z, p_z, distribution, beta=1.0,
                 recon_loss_type="l1", l1_weight=1.0, sigmas=(None, None)):
    """``cnn/models.py:247-315`` — shared by CNNVAE / CliffordARVAE / HybridVAE."""
    from cliffordtpu.distributions import kl_divergence

    B = x.shape[0]
    kl = kl_divergence(q_z, p_z)
    if distribution == "gaussian":
        kld = kl.sum(axis=-1).mean()
    else:
        kld = kl.mean()

    if recon_loss_type == "mse":
        recon_loss = ((x_recon - x) ** 2).sum() / B
    elif recon_loss_type == "l1":
        recon_loss = l1_weight * jnp.abs(x_recon - x).sum() / B
    else:
        raise ValueError(recon_loss_type)

    sigma_0, sigma_1 = sigmas
    if sigma_0 is not None:
        total = (
            recon_loss / sigma_0[0] ** 2
            + kld / sigma_1[0] ** 2
            + sigma_0[0] ** 2
            + sigma_1[0] ** 2
        )
        effective_beta = (sigma_0[0] / sigma_1[0]) ** 2
    else:
        total = recon_loss + beta * kld
        effective_beta = jnp.asarray(beta)

    entropy = q_z.entropy().mean() if hasattr(q_z, "entropy") else jnp.zeros(())
    out = {
        "total_loss": total,
        "recon_loss": recon_loss,
        "kld_loss": kld,
        "entropy": entropy,
        "effective_beta": effective_beta,
    }
    if sigma_0 is not None:
        out["sigma_0"] = sigma_0[0]
        out["sigma_1"] = sigma_1[0]
    return out
