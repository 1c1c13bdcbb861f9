"""Model layer (L2): flax.linen VAE families.

* ``mlp_vae``    — 784-256-128 MLP VAE, 4 latent families (MNIST runners)
* ``conv_vae``   — ResBlock CNN VAE (fashion / cifar10 runners)
* ``vit_vae``    — hybrid CNN+ViT CliffordAR-style S-VAE with per-token latents
* ``hybrid_vae`` — CNN-only per-token VAE
* ``reparam``    — shared encode-head activations + reparameterize dispatch
* ``losses``     — ELBO / IWAE / test metrics
"""

from cliffordtpu.nn.mlp_vae import MLPVAE
from cliffordtpu.nn.conv_vae import CNNVAE, cnn_vae_loss
from cliffordtpu.nn.vit_vae import CliffordARVAE, default_config
from cliffordtpu.nn.hybrid_vae import HybridVAE
from cliffordtpu.nn.reparam import reparameterize
from cliffordtpu.nn import losses

__all__ = [
    "MLPVAE",
    "CNNVAE",
    "CliffordARVAE",
    "HybridVAE",
    "cnn_vae_loss",
    "default_config",
    "reparameterize",
    "losses",
]
