"""CNN-only per-token VAE — flax rebuild of ``cnn/cliffordar_model.py:607-848``.

Each spatial token after the down-stack gets its own latent vector;
1x1-conv heads produce per-token (mu, kappa/logvar); the decoder projects
back and upsamples.  NHWC layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from cliffordtpu.nn.mlp_vae import l2_normalize
from cliffordtpu.nn.reparam import reparameterize, sample_latent
from cliffordtpu.nn.vit_vae import _gn

_XAVIER = nn.initializers.xavier_uniform()


class HybridResDownBlock(nn.Module):
    """``cliffordar_model.py:611-625``."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(in_ch)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER)(h)
        h = _gn(self.out_ch)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER)(h)
        short = nn.Conv(self.out_ch, (2, 2), strides=(2, 2), padding="VALID",
                        use_bias=False, kernel_init=_XAVIER)(x)
        return short + h


class HybridResUpBlock(nn.Module):
    """``cliffordar_model.py:628-650`` — single-conv block2 variant."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(in_ch)(x)
        h = nn.silu(h)
        h = nn.ConvTranspose(self.out_ch, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, kernel_init=_XAVIER)(h)
        h = _gn(self.out_ch)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER)(h)
        short = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                                 padding="VALID", use_bias=False,
                                 kernel_init=_XAVIER)(x)
        x = short + h
        h2 = _gn(self.out_ch)(x)
        h2 = nn.silu(h2)
        h2 = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, kernel_init=_XAVIER)(h2)
        return x + h2


class HybridEncoder(nn.Module):
    """``cliffordar_model.py:653-685``."""

    latent_dim: int
    distribution: str
    cnn_chs: Sequence[int]
    concentration_floor: float = 0.03

    @nn.compact
    def __call__(self, x):
        chs = list(self.cnn_chs)
        x = nn.Conv(chs[0], (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    kernel_init=_XAVIER, name="input_conv")(x)
        for i, ch in enumerate(chs[1:]):
            x = HybridResDownBlock(ch, name=f"down_{i}")(x)
        mu_map = nn.Conv(self.latent_dim, (1, 1), kernel_init=_XAVIER,
                         name="fc_mu")(x)
        B, H, W, D = mu_map.shape
        mu = mu_map.reshape(B, H * W, D)
        if self.distribution == "gaussian":
            logvar = nn.Conv(self.latent_dim, (1, 1), kernel_init=_XAVIER,
                             name="fc_logvar")(x).reshape(B, H * W, D)
            return mu, logvar
        kappa = nn.Conv(1, (1, 1), kernel_init=_XAVIER,
                        name="fc_kappa")(x).reshape(B, H * W)
        if self.distribution == "powerspherical":
            mu = l2_normalize(mu)
            kappa = jnp.clip(nn.softplus(kappa) + 0.8, max=10.0)
        else:  # clifford
            kappa = jnp.clip(
                nn.softplus(kappa) + self.concentration_floor, max=10.0
            )
        return mu, kappa


class HybridDecoder(nn.Module):
    """``cliffordar_model.py:688-709``."""

    out_channels: int
    cnn_chs: Sequence[int]
    spatial_size: int

    @nn.compact
    def __call__(self, z):
        chs = list(self.cnn_chs)
        B, T, D = z.shape
        H = W = self.spatial_size
        x = nn.Dense(chs[0], use_bias=False, kernel_init=_XAVIER,
                     name="input_proj")(z)
        x = x.reshape(B, H, W, chs[0])
        for i, ch in enumerate(chs[1:]):
            x = HybridResUpBlock(ch, name=f"up_{i}")(x)
        x = _gn(x.shape[-1])(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=_XAVIER, name="output_conv")(x)
        return nn.tanh(x)


class HybridVAE(nn.Module):
    """``cliffordar_model.py:712-848``."""

    latent_dim: int = 16
    in_channels: int = 3
    distribution: str = "clifford"
    recon_loss_type: str = "l1"
    l1_weight: float = 1.0
    encoder_chs: Optional[Sequence[int]] = None
    decoder_chs: Optional[Sequence[int]] = None
    use_learnable_beta: bool = False
    l2_normalize: bool = False
    concentration_floor: float = 0.03
    img_size: int = 32

    def _chs(self) -> Tuple[list, list]:
        enc = list(self.encoder_chs) if self.encoder_chs else (
            [64, 128, 256, 512] if self.img_size == 64 else [64, 128, 256]
        )
        dec = list(self.decoder_chs) if self.decoder_chs else enc[::-1]
        return enc, dec

    @property
    def token_spatial_size(self) -> int:
        enc, _ = self._chs()
        return self.img_size // (2 ** (len(enc) - 1))

    @property
    def num_tokens(self) -> int:
        return self.token_spatial_size ** 2

    def setup(self):
        enc, dec = self._chs()
        self.encoder = HybridEncoder(
            latent_dim=self.latent_dim,
            distribution=self.distribution,
            cnn_chs=enc,
            concentration_floor=self.concentration_floor,
        )
        self.decoder = HybridDecoder(
            out_channels=self.in_channels,
            cnn_chs=dec,
            spatial_size=self.token_spatial_size,
        )
        if self.use_learnable_beta:
            self.log_sigma_0 = self.param(
                "log_sigma_0", nn.initializers.zeros, (1,))
            self.log_sigma_1 = self.param(
                "log_sigma_1", nn.initializers.zeros, (1,))

    def encode_heads(self, x):
        return self.encoder(x)

    def decode(self, z):
        if z.ndim == 2:
            dec_dim = (2 * self.latent_dim
                       if self.distribution == "clifford" else self.latent_dim)
            z = z.reshape(z.shape[0], self.num_tokens, dec_dim)
        return self.decoder(z)

    def reparam(self, mu, params):
        if self.distribution == "clifford":
            params = jnp.broadcast_to(params[..., None], mu.shape)
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
        x_recon = self.decode(z)
        return x_recon, q_z, p_z, mu

    def get_flat_latent(self, x):
        mu, params = self.encoder(x)
        z, _, _ = self.reparam(mu, params)
        return z.reshape(z.shape[0], -1)

    def loss_sigmas(self):
        if self.use_learnable_beta:
            return jnp.exp(self.log_sigma_0), jnp.exp(self.log_sigma_1)
        return None, None
