"""Model access adapter for the evaluation battery.

The reference duck-types torch modules at runtime
(``utils/wandb_utils.py:16-42``: ``_get_flat_z`` / ``_decode`` /
``_extract_latent_mu``).  Here a ``ModelHandle`` pairs the flax module with
its params and exposes the same three capabilities as jitted callables.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ModelHandle:
    model: Any
    params: Any

    @property
    def distribution(self) -> str:
        return getattr(self.model, "distribution", "normal")

    @property
    def latent_dim(self) -> int:
        return getattr(self.model, "latent_dim",
                       getattr(self.model, "z_dim", 0))

    @property
    def num_tokens(self) -> Optional[int]:
        try:
            return self.model.num_tokens
        except AttributeError:
            return None

    def flat_z(self, x, key):
        """Sampled latent, flattened per example (``wandb_utils.py:16-34``)."""
        m = self.model
        if hasattr(m, "get_flat_latent"):
            return m.apply({"params": self.params}, jnp.asarray(x),
                           rngs={"sample": key}, method=m.get_flat_latent)
        raise AttributeError(f"{type(m).__name__} lacks get_flat_latent")

    def latent_mu(self, x, key):
        """Posterior mean, flattened (``wandb_utils.py:343-360``).

        For MLPVAE this is ``encode(x)[0]`` (the reference's kNN/class-mean
        path encodes without sampling, ``mnist_clifpws.py:46-53``); for
        per-token models the mu is flattened over tokens.
        """
        m = self.model
        x = jnp.asarray(x)
        if hasattr(m, "encode_heads"):
            mu, _ = m.apply({"params": self.params}, x,
                            method=m.encode_heads)
        else:
            mu, _ = m.apply({"params": self.params},
                            x.reshape(x.shape[0], -1), method=m.encode)
        if mu.ndim == 3:
            mu = mu.reshape(mu.shape[0], -1)
        return mu

    def decode(self, z):
        """Decoder that accepts flat per-token latents
        (``wandb_utils.py:37-42``)."""
        m = self.model
        return m.apply({"params": self.params}, jnp.asarray(z),
                       method=m.decode)

    def collect_flat_z(self, x, y, key, limit: int = 200, batch: int = 100):
        """Encode up to ``limit`` examples into flat sampled latents."""
        zs, ys = [], []
        n = 0
        for s in range(0, min(len(x), limit * 2), batch):
            xb = x[s:s + batch]
            z = self.flat_z(xb, jax.random.fold_in(key, s))
            zs.append(z)
            ys.append(y[s:s + batch])
            n += xb.shape[0]
            if n >= limit:
                break
        import numpy as np

        return (jnp.concatenate(zs, 0)[:limit],
                np.concatenate(ys, 0)[:limit])
