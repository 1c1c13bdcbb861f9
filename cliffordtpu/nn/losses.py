"""VAE losses and test metrics — rebuild of ``mnist/mlp_vae.py:107-222``.

All functions are pure and jittable; the model forward pass is supplied by
the caller so the same losses serve every model family.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from cliffordtpu.distributions import kl_divergence
from cliffordtpu.distributions.normal import Normal


def bce_with_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (stable form)."""
    return (
        jnp.clip(logits, min=0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def vae_loss_from_outputs(x, outputs, beta: float = 1.0) -> Dict[str, jnp.ndarray]:
    """ELBO pieces from an MLPVAE forward pass (``mlp_vae.py:107-143``).

    recon = BCE-with-logits summed / B;  kl = mean over the full KL tensor
    (for "normal" this is the per-dim mean — a reference quirk kept as-is).
    """
    _, (q_z, p_z), _, x_recon = outputs
    x_flat = x.reshape(x.shape[0], -1)
    B = x_flat.shape[0]
    recon = bce_with_logits(x_recon, x_flat).sum() / B
    kl = kl_divergence(q_z, p_z).mean()
    entropy = q_z.entropy().mean() if hasattr(q_z, "entropy") else jnp.zeros(())
    total = recon + beta * kl
    return {
        "total": total,
        "recon": recon,
        "kl": kl,
        "entropy": entropy,
        "elbo": -recon - kl,
    }


def iwae_log_likelihood(
    key, model, params, x, n_samples: int = 10
) -> jnp.ndarray:
    """Importance-weighted log-likelihood bound (``mlp_vae.py:146-190``)."""
    from cliffordtpu.nn.reparam import reparameterize

    x_flat = x.reshape(x.shape[0], -1)
    z_mean, z_param2 = model.apply(
        {"params": params}, x_flat, method=model.encode
    )
    q_z, p_z = reparameterize(model.distribution, z_mean, z_param2, model.z_dim)
    z = q_z.sample(key, (n_samples,))

    x_recon = model.apply({"params": params}, z, method=model.decode)

    log_p_z = p_z.log_prob(z)
    if model.distribution == "normal":
        log_p_z = log_p_z.sum(-1)
    log_p_x_z = -bce_with_logits(x_recon, x_flat[None]).sum(-1)
    log_q_z_x = q_z.log_prob(z)
    if model.distribution == "normal":
        log_q_z_x = log_q_z_x.sum(-1)

    log_w = log_p_x_z + log_p_z - log_q_z_x  # (n_samples, B)
    ll = jax.scipy.special.logsumexp(log_w, axis=0) - math.log(n_samples)
    return ll.mean()


def compute_test_metrics(
    key, model, params, batches, n_iwae_samples: int = 10
) -> Dict[str, float]:
    """Dataset-mean ll / entropy / recon / kl (``mlp_vae.py:193-222``).

    ``batches`` is an iterable of (x, y) numpy/jax arrays.
    """
    import numpy as np

    totals = {"ll": 0.0, "entropy": 0.0, "recon": 0.0, "kl": 0.0}
    n_total = 0
    for i, (x, _) in enumerate(batches):
        x = jnp.asarray(x)
        bkey = jax.random.fold_in(key, i)
        k1, k2 = jax.random.split(bkey)
        outputs = model.apply(
            {"params": params}, x, rngs={"sample": k1}
        )
        res = vae_loss_from_outputs(x, outputs, beta=1.0)
        B = x.shape[0]
        totals["recon"] += float(-res["recon"]) * B
        totals["kl"] += float(res["kl"]) * B
        totals["entropy"] += float(res["entropy"]) * B
        totals["ll"] += float(
            iwae_log_likelihood(k2, model, params, x, n_iwae_samples)
        ) * B
        n_total += B
    return {k: v / n_total for k, v in totals.items()}
