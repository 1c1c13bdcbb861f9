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


def iwae_log_likelihood_cnn(
    key, model, params, x, n_samples: int = 10,
    recon_loss_type: str | None = None,
) -> jnp.ndarray:
    """Importance-weighted log-likelihood bound for the CNN / per-token ViT
    families — an EXTENSION beyond the reference, which defines IWAE only
    for the MLP (``mnist/mlp_vae.py:146-190``).

    The decoder likelihood matches the training reconstruction loss:
    ``l1`` -> unit-scale Laplace, ``mse`` -> unit-variance Gaussian, summed
    over pixels.  Deterministic latent post-transforms (the per-token
    PowerSpherical sqrt(d) scale, the gaussian l2 projection) are folded
    into the decoder, so the importance weights use q/p of the raw draw —
    a valid bound for the corresponding generative model.
    """
    from cliffordtpu.nn.reparam import reparameterize

    dist = model.distribution
    recon = recon_loss_type or getattr(model, "recon_loss_type", "l1")
    mu, head = model.apply({"params": params}, x, method=model.encode_heads)
    if dist == "clifford":
        if head.ndim == mu.ndim - 1:
            head = head[..., None]  # per-token scalar kappa
        head = jnp.broadcast_to(head, mu.shape)
    q_z, p_z = reparameterize(dist, mu, head, model.latent_dim)
    z = q_z.sample(key, (n_samples,))

    log_q = q_z.log_prob(z)
    log_p = p_z.log_prob(z)
    if dist in ("normal", "gaussian"):
        log_q = log_q.sum(-1)
        log_p = log_p.sum(-1)
    log_p = jnp.broadcast_to(log_p, log_q.shape)
    while log_q.ndim > 2:  # per-token models: sum over the token axis
        log_q = log_q.sum(-1)
        log_p = log_p.sum(-1)

    z_dec = z
    if dist in ("normal", "gaussian") and getattr(model, "l2_normalize", False):
        z_dec = z_dec / jnp.linalg.norm(z_dec, axis=-1, keepdims=True)
    if dist == "powerspherical" and hasattr(model, "num_tokens"):
        z_dec = z_dec * (model.latent_dim ** 0.5)  # ``cliffordar_model.py:491``

    def dec(z_i):  # sequential over samples: bounds peak decoder memory
        return model.apply({"params": params}, z_i, method=model.decode)

    x_recs = jax.lax.map(dec, z_dec)  # (n_samples, B, H, W, C)
    diff = x_recs - x[None].astype(x_recs.dtype)
    axes = tuple(range(2, diff.ndim))
    n_pix = math.prod(x.shape[1:])
    if recon == "l1":
        log_p_x_z = -jnp.abs(diff).sum(axes) - math.log(2.0) * n_pix
    else:
        log_p_x_z = (-0.5 * (diff ** 2).sum(axes)
                     - 0.5 * math.log(2.0 * math.pi) * n_pix)

    log_w = log_p_x_z + log_p - log_q  # (n_samples, B)
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
