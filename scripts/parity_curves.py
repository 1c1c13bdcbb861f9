#!/usr/bin/env python
"""Trained ELBO-curve parity: torch reference vs this framework.

The north-star contract (BASELINE.json / SURVEY §6) is that training the
JAX runner reproduces the reference's per-epoch ELBO/KL curves.  This
harness trains the *reference's own* ``mnist.mlp_vae.MLPVAE`` (imported
live from the reference checkout, never copied) and our flax ``MLPVAE``
side by side from identical initial weights, identical batch order and
identical dynamic-binarization draws, then diffs the per-epoch curves.

Two rigor levels, because of what can honestly be pinned:

* ``--mode exact`` (gaussian families): the reparameterization noise
  ``eps`` is also shared, so both frameworks compute the *same* training
  trajectory.  Both sides run in float64: training is chaotic, so in
  float32 the two frameworks' different summation orders alone blow up
  to ~0.1 after a few epochs (measured), drowning the signal; in float64
  rounding noise stays ~1e-9 while any *algorithmic* mismatch (formula,
  optimizer math, clipping) would still surface far above the bar.
  Pass bar: every per-epoch train/val total/recon/KL diff ≤
  ``--tol_per_dim`` (default 1e-3) × z_dim.
* ``--mode statistical`` (clifford / powerspherical): the latent samplers
  are framework-native (our fixed-budget TPU samplers are *designed*
  differently from torch's rejection loops, so their draws cannot be
  pinned).  Both frameworks are trained as ``--n_seeds``-run ensembles
  from the same init/data/batch order; per epoch the ensemble means must
  agree within ``--floor_mult`` × the combined seed-to-seed std (ddof=1),
  with an absolute floor of tol_per_dim × z_dim.  This detects systematic
  errors (wrong KL scale, wrong loss) while absorbing the sampler-noise
  timing jitter of the steep transition epochs.

Reference training loop mirrored from ``mnist/mnist_clifpws.py:268-318``
(Adam, global-norm clip 1.0, linear KL warmup ``min(1,(e+1)/warmup)``,
val at beta=1) and loss from ``mnist/mlp_vae.py:107-143``.

Writes ``parity_curves_{dist}.json`` with all curves + verdict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

REF = os.environ.get("CLIFFORDTPU_REFERENCE", "/root/reference")


def _load_reference():
    sys.path.insert(0, REF)
    import torch  # noqa: F401

    from mnist.mlp_vae import MLPVAE as TorchMLPVAE
    from mnist.mlp_vae import vae_loss as torch_vae_loss

    return TorchMLPVAE, torch_vae_loss


def _make_data(args, rng):
    """Binarized MNIST with shared draws: returns (x_train, x_val) in
    {0,1} plus per-epoch binarization thresholds (dynamic binarization,
    ``mnist_clifpws.py:40-42``), identical for both frameworks."""
    from cliffordtpu.data import load_dataset

    ds = load_dataset("mnist", n_train=args.limit_train,
                      n_test=args.limit_test)
    x = ds["x_train"].reshape(len(ds["x_train"]), -1).astype(np.float32)
    n_train = int(0.9 * len(x))
    x_train, x_val = x[:n_train], x[n_train:]
    # per-epoch thresholds for train; one fixed draw for val
    thr_train = rng.uniform(size=(args.epochs,) + x_train.shape).astype(
        np.float32)
    thr_val = rng.uniform(size=x_val.shape).astype(np.float32)
    x_val_bin = (x_val > thr_val).astype(np.float32)
    perms = np.stack([rng.permutation(n_train) for _ in range(args.epochs)])
    return x_train, thr_train, x_val_bin, perms, ds["source"]


def train_torch(args, x_train, thr_train, x_val_bin, perms, init_state_dict,
                torch_seed, eps_train=None, eps_val=None):
    """Train the reference model; returns per-epoch curves + final sd."""
    import torch
    import torch.nn.functional as F

    TorchMLPVAE, torch_vae_loss = _load_reference()
    torch.manual_seed(torch_seed)
    tm = TorchMLPVAE(h_dim=args.h_dim, z_dim=args.z_dim,
                     distribution=args.model_dist,
                     l2_normalize=args.l2_normalize)
    tm.load_state_dict({k: torch.tensor(v)
                        for k, v in init_state_dict.items()})
    exact = eps_train is not None
    dt = torch.float64 if exact else torch.float32
    tm = tm.to(dt)
    tensor = lambda a: torch.tensor(a).to(dt)  # noqa: E731
    opt = torch.optim.Adam(tm.parameters(), lr=args.lr)
    n_steps = len(perms[0]) // args.batch_size

    def exact_loss(xb, eps, beta):
        # gaussian-only pinned-noise path: z = mean + std*eps, every
        # formula identical to mlp_vae.py:77-80,100-102,120-135
        mean, logvar = tm.encode(xb)
        std = torch.exp(0.5 * logvar) + 1e-6
        z = mean + std * eps
        if tm.l2_normalize:
            z = F.normalize(z, p=2, dim=-1)
        logits = tm.decoder(z)
        recon = F.binary_cross_entropy_with_logits(
            logits, xb, reduction="sum") / xb.size(0)
        q = torch.distributions.Normal(mean, std)
        p = torch.distributions.Normal(torch.zeros_like(mean),
                                       torch.ones_like(std))
        kl = torch.distributions.kl.kl_divergence(q, p).mean()
        return recon + beta * kl, recon, kl

    curves = {k: [] for k in ("train_total", "train_recon", "train_kl",
                              "val_total", "val_recon", "val_kl")}
    for epoch in range(args.epochs):
        beta = min(1.0, (epoch + 1) / max(1, args.warmup_epochs))
        tm.train()
        tot = rec = kld = 0.0
        for s in range(n_steps):
            idx = perms[epoch][s * args.batch_size:(s + 1) * args.batch_size]
            xb = tensor(
                (x_train[idx] > thr_train[epoch][idx]).astype(np.float32))
            opt.zero_grad()
            if exact:
                loss, recon, kl = exact_loss(
                    xb, tensor(eps_train[epoch][s]), beta)
            else:
                d = torch_vae_loss(tm, xb, beta=beta, return_dict=True)
                loss, recon, kl = d["total"], d["recon"], d["kl"]
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), max_norm=1.0)
            opt.step()
            tot += loss.item(); rec += recon.item(); kld += kl.item()
        curves["train_total"].append(tot / n_steps)
        curves["train_recon"].append(rec / n_steps)
        curves["train_kl"].append(kld / n_steps)

        tm.eval()
        tot = rec = kld = 0.0
        n_val_steps = 0
        for s in range(0, len(x_val_bin), args.batch_size):
            xb = tensor(x_val_bin[s:s + args.batch_size])
            if exact:
                with torch.no_grad():
                    loss, recon, kl = exact_loss(
                        xb, tensor(eps_val[s:s + len(xb)]), 1.0)
            else:
                with torch.no_grad():
                    d = torch_vae_loss(tm, xb, beta=1.0, return_dict=True)
                loss, recon, kl = d["total"], d["recon"], d["kl"]
            tot += loss.item(); rec += recon.item(); kld += kl.item()
            n_val_steps += 1
        curves["val_total"].append(tot / n_val_steps)
        curves["val_recon"].append(rec / n_val_steps)
        curves["val_kl"].append(kld / n_val_steps)
    return curves


def train_jax(args, x_train, thr_train, x_val_bin, perms, init_state_dict,
              eps_train=None, eps_val=None, jax_seed=None):
    import optax

    from cliffordtpu.distributions import kl_divergence
    from cliffordtpu.nn import MLPVAE
    from cliffordtpu.nn.losses import bce_with_logits
    from cliffordtpu.nn.reparam import reparameterize, sample_latent
    from cliffordtpu.utils.torch_interop import copy_mlp_weights

    exact = eps_train is not None
    if exact:
        jax.config.update("jax_enable_x64", True)
    dt = jnp.float64 if exact else jnp.float32

    jm = MLPVAE(h_dim=args.h_dim, z_dim=args.z_dim,
                distribution=args.model_dist, l2_normalize=args.l2_normalize)
    key = jax.random.PRNGKey(jax_seed if jax_seed is not None else args.seed)
    params = jm.init({"params": key, "sample": key},
                     jnp.zeros((2, 784)))["params"]
    params = copy_mlp_weights(init_state_dict, params, args.model_dist)
    params = jax.tree_util.tree_map(lambda a: jnp.asarray(a, dt), params)

    def clip_like_torch(max_norm):
        """torch.nn.utils.clip_grad_norm_ scales by max_norm/(norm+1e-6);
        optax's clip_by_global_norm has no epsilon.  The 5e-8 relative
        difference is irrelevant in production but seeds visible drift in
        a chaotic trajectory, so the parity harness mirrors torch."""
        def init(params):
            del params
            return optax.EmptyState()

        def update(updates, state, params=None):
            del params
            norm = optax.global_norm(updates)
            scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
            return jax.tree_util.tree_map(lambda g: g * scale,
                                          updates), state

        return optax.GradientTransformation(init, update)

    clip = (clip_like_torch(1.0) if exact
            else optax.clip_by_global_norm(1.0))
    tx = optax.chain(clip, optax.adam(args.lr))
    opt_state = tx.init(params)

    def loss_fn(params, xb, noise, beta):
        mean, p2 = jm.apply({"params": params}, xb, method=jm.encode)
        q_z, p_z = reparameterize(args.model_dist, mean, p2, args.z_dim)
        if exact:
            std = jnp.exp(0.5 * p2) + 1e-6
            z = mean + std * noise
            if args.l2_normalize:
                z = z / jnp.linalg.norm(z, axis=-1, keepdims=True)
        else:
            z = sample_latent(noise, args.model_dist, q_z,
                              l2_normalize=args.l2_normalize)
        logits = jm.apply({"params": params}, z, method=jm.decode)
        recon = bce_with_logits(logits, xb).sum() / xb.shape[0]
        kl = kl_divergence(q_z, p_z).mean()
        return recon + beta * kl, (recon, kl)

    @jax.jit
    def train_step(params, opt_state, xb, noise, beta):
        (loss, (recon, kl)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, xb, noise, beta)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, recon, kl

    @jax.jit
    def eval_step(params, xb, noise):
        return loss_fn(params, xb, noise, 1.0)

    n_steps = len(perms[0]) // args.batch_size
    curves = {k: [] for k in ("train_total", "train_recon", "train_kl",
                              "val_total", "val_recon", "val_kl")}
    for epoch in range(args.epochs):
        beta = float(min(1.0, (epoch + 1) / max(1, args.warmup_epochs)))
        tot = rec = kld = 0.0
        for s in range(n_steps):
            idx = perms[epoch][s * args.batch_size:(s + 1) * args.batch_size]
            xb = jnp.asarray(
                (x_train[idx] > thr_train[epoch][idx]).astype(np.float32), dt)
            noise = (jnp.asarray(eps_train[epoch][s], dt) if exact else
                     jax.random.fold_in(key, epoch * 100_003 + s))
            params, opt_state, loss, recon, kl = train_step(
                params, opt_state, xb, noise, beta)
            tot += float(loss); rec += float(recon); kld += float(kl)
        curves["train_total"].append(tot / n_steps)
        curves["train_recon"].append(rec / n_steps)
        curves["train_kl"].append(kld / n_steps)

        tot = rec = kld = 0.0
        n_val_steps = 0
        for s in range(0, len(x_val_bin), args.batch_size):
            xb = jnp.asarray(x_val_bin[s:s + args.batch_size], dt)
            noise = (jnp.asarray(eps_val[s:s + xb.shape[0]], dt) if exact
                     else jax.random.fold_in(key,
                                             7_000_000 + epoch * 1000 + s))
            loss, (recon, kl) = eval_step(params, xb, noise)
            tot += float(loss); rec += float(recon); kld += float(kl)
            n_val_steps += 1
        curves["val_total"].append(tot / n_val_steps)
        curves["val_recon"].append(rec / n_val_steps)
        curves["val_kl"].append(kld / n_val_steps)
    return curves


def run_parity(args):
    """Returns the result dict (also used by tests)."""
    import torch

    TorchMLPVAE, _ = _load_reference()
    args.model_dist = ("normal" if args.dist in ("gaussian", "normal",
                                                 "normal_nol2")
                       else args.dist)
    args.l2_normalize = args.dist == "normal"
    args.z_dim = (args.d + 1 if args.dist == "powerspherical" else args.d)

    rng = np.random.RandomState(args.seed)
    x_train, thr_train, x_val_bin, perms, source = _make_data(args, rng)

    torch.manual_seed(args.seed)
    init_tm = TorchMLPVAE(h_dim=args.h_dim, z_dim=args.z_dim,
                          distribution=args.model_dist,
                          l2_normalize=args.l2_normalize)
    init_sd = {k: v.detach().numpy().copy()
               for k, v in init_tm.state_dict().items()}

    n_steps = len(perms[0]) // args.batch_size
    if args.mode == "exact":
        if args.model_dist != "normal":
            raise SystemExit("--mode exact is only honest for the gaussian "
                             "family (other samplers cannot share draws)")
        eps_train = rng.randn(args.epochs, n_steps, args.batch_size,
                              args.z_dim).astype(np.float32)
        eps_val = rng.randn(len(x_val_bin), args.z_dim).astype(np.float32)
    else:
        eps_train = eps_val = None

    abs_tol = args.tol_per_dim * args.z_dim
    print(f"[parity] dist={args.dist} mode={args.mode} d={args.d} "
          f"epochs={args.epochs} steps/epoch={n_steps} data={source}")
    report = {"dist": args.dist, "mode": args.mode, "d": args.d,
              "z_dim": args.z_dim, "epochs": args.epochs,
              "data_source": source, "abs_tol": abs_tol}
    ok = True

    if args.mode == "exact":
        ref = train_torch(args, x_train, thr_train, x_val_bin, perms,
                          init_sd, torch_seed=args.seed,
                          eps_train=eps_train, eps_val=eps_val)
        ours = train_jax(args, x_train, thr_train, x_val_bin, perms,
                         init_sd, eps_train=eps_train, eps_val=eps_val)
        report["torch"] = ref
        report["jax"] = ours
        for metric in ref:
            diff = np.abs(np.asarray(ref[metric]) -
                          np.asarray(ours[metric]))
            m_ok = bool((diff <= abs_tol).all())
            ok &= m_ok
            report[f"maxdiff_{metric}"] = float(diff.max())
            print(f"  {metric:12s} max|Δ|={diff.max():.2e} "
                  f"tol={abs_tol:.5f} {'OK' if m_ok else 'FAIL'}")
    else:
        t_runs = [train_torch(args, x_train, thr_train, x_val_bin, perms,
                              init_sd, torch_seed=args.seed + i)
                  for i in range(args.n_seeds)]
        j_runs = [train_jax(args, x_train, thr_train, x_val_bin, perms,
                            init_sd, jax_seed=args.seed + i)
                  for i in range(args.n_seeds)]
        report["torch_runs"] = t_runs
        report["jax_runs"] = j_runs
        for metric in t_runs[0]:
            T = np.asarray([r[metric] for r in t_runs])
            J = np.asarray([r[metric] for r in j_runs])
            diff = np.abs(T.mean(0) - J.mean(0))
            spread = np.sqrt(T.std(0, ddof=1) ** 2 + J.std(0, ddof=1) ** 2)
            tol = np.maximum(abs_tol, args.floor_mult * spread)
            m_ok = bool((diff <= tol).all())
            ok &= m_ok
            report[f"maxdiff_{metric}"] = float(diff.max())
            report[f"tol_{metric}"] = [float(t) for t in tol]
            print(f"  {metric:12s} max|Δmean|={diff.max():.4f} "
                  f"tol={float(np.min(tol)):.4f}..{float(np.max(tol)):.4f} "
                  f"{'OK' if m_ok else 'FAIL'}")
    report["pass"] = bool(ok)
    return report


def build_parser():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dist", default="gaussian",
                   choices=["gaussian", "normal", "normal_nol2",
                            "powerspherical", "clifford"])
    p.add_argument("--mode", default=None, choices=["exact", "statistical"],
                   help="default: exact for gaussian, statistical otherwise")
    p.add_argument("--d", type=int, default=5)
    p.add_argument("--h_dim", type=int, default=128)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--warmup_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--limit_train", type=int, default=4096)
    p.add_argument("--limit_test", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol_per_dim", type=float, default=1e-3)
    p.add_argument("--floor_mult", type=float, default=3.0)
    p.add_argument("--n_seeds", type=int, default=3,
                   help="ensemble size per framework (statistical mode)")
    p.add_argument("--outdir", default=".")
    return p


if __name__ == "__main__":
    args = build_parser().parse_args()
    if args.mode is None:
        args.mode = ("exact" if args.dist in ("gaussian", "normal",
                                              "normal_nol2")
                     else "statistical")
    report = run_parity(args)
    out = os.path.join(args.outdir, f"parity_curves_{args.dist}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"wrote {out}; pass={report['pass']}")
    raise SystemExit(0 if report["pass"] else 1)
