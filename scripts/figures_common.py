"""Shared helpers for the standalone figure scripts (Schlegel-style heatmaps).

Vector inits (HRR / unitary / clifford-torus) and the d x k accuracy sweeps,
vmapped over trials.  Mirrors ``scripts/bundle_heatmap.py:16-61`` etc.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from cliffordtpu.vsa.capacity import (
    test_binding_unbinding_pairs,
    test_bundle_capacity,
)
from cliffordtpu.vsa.ops import (
    bind,
    hrr_init,
    normalize_vectors,
    similarity,
    unbind,
    unitary_init,
)


def clifford_init(key, n: int, d: int) -> jnp.ndarray:
    """Random torus vectors in R^{2d} — mirrors the reference's
    ``scripts/bundle_heatmap.py:16-29`` including its quirk of writing 1.0
    *radians* into the DC and Nyquist phase slots (the framework's own
    ``angles_to_torus`` pins them to phase 0 instead)."""
    angles = jax.random.uniform(key, (n, d)) * (2 * math.pi)
    freq_dim = 2 * d
    theta_s = jnp.zeros((n, freq_dim))
    theta_s = theta_s.at[:, 0].set(1.0)
    theta_s = theta_s.at[:, 1:d].set(angles[:, 1:])
    theta_s = theta_s.at[:, -d + 1:].set(-jnp.flip(angles[:, 1:], axis=-1))
    if freq_dim % 2 == 0:
        theta_s = theta_s.at[:, freq_dim // 2].set(1.0)
    fv = jnp.cos(theta_s) + 1j * jnp.sin(theta_s)
    return jnp.fft.ifft(fv, axis=-1).real.astype(jnp.float32)


INIT_FNS = {
    "HRR": hrr_init,
    "Unitary": unitary_init,
    "Clifford": clifford_init,
}


def run_bundle_heatmap(init_fn, name, dims, k_range, n_items=1000,
                       n_trials=20, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    acc = np.full((len(dims), len(k_range)), np.nan)
    for i, d in enumerate(dims):
        print(f"  {name} d={d}...")
        vk = jax.random.fold_in(key, d)
        vectors = normalize_vectors(init_fn(vk, n_items, d))
        res = test_bundle_capacity(
            d=vectors.shape[-1], n_items=n_items,
            k_range=[k for k in k_range if 2 * k <= n_items],
            n_trials=n_trials, item_memory=vectors, key=vk)
        for j, k in enumerate(k_range):
            if k in res["k"]:
                acc[i, j] = res["accuracy"][res["k"].index(k)]
    return acc


def run_rolefiller_heatmap(init_fn, name, dims, k_range, n_items=1000,
                           n_trials=10, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    acc = np.full((len(dims), len(k_range)), np.nan)
    for i, d in enumerate(dims):
        print(f"  {name} d={d}...")
        vk = jax.random.fold_in(key, d)
        vectors = normalize_vectors(init_fn(vk, n_items, d))
        res = test_binding_unbinding_pairs(
            d=vectors.shape[-1], n_items=n_items,
            k_range=[k for k in k_range if 2 * k <= n_items],
            n_trials=n_trials, item_memory=vectors, bind_with_random=False,
            key=vk)
        for j, k in enumerate(k_range):
            if k in res["k"]:
                acc[i, j] = res["accuracy"][res["k"].index(k)]
    return acc


def run_depth_heatmap(init_fn, name, dims, max_depth=40, n_trials=10,
                      key=None):
    from cliffordtpu.eval.binding import _depth_curve_jit

    key = key if key is not None else jax.random.PRNGKey(0)
    depths = list(range(1, max_depth + 1))
    sim = np.full((len(dims), len(depths)), np.nan)
    for i, d in enumerate(dims):
        print(f"  {name} d={d}...")
        vk = jax.random.fold_in(key, d)
        vecs = jnp.stack([
            normalize_vectors(init_fn(jax.random.fold_in(vk, t),
                                      max_depth + 1, d))
            for t in range(n_trials)
        ])
        sims = np.asarray(_depth_curve_jit(vecs[:, 0, :], vecs[:, 1:, :],
                                           "inv"))
        sim[i] = sims.mean(0)
    return sim, depths


def plot_heatmaps(results, dims, x_vals, xlabel, title, cbar_label,
                  save_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    n = len(results)
    fig, axes = plt.subplots(1, n, figsize=(5 * n + 1, 4.5), sharey=True)
    if n == 1:
        axes = [axes]
    norm = mcolors.Normalize(vmin=0.0, vmax=1.0)
    for ax, (name, mat) in zip(axes, results.items()):
        masked = np.ma.masked_invalid(mat)
        ax.pcolormesh(np.arange(len(x_vals) + 1), np.arange(len(dims) + 1),
                      masked, cmap=plt.cm.jet, norm=norm, shading="flat")
        step = max(1, len(x_vals) // 12)
        ax.set_xticks(np.arange(0, len(x_vals), step) + 0.5)
        ax.set_xticklabels([x_vals[i] for i in range(0, len(x_vals), step)],
                           rotation=45, fontsize=7)
        ax.set_yticks(np.arange(len(dims)) + 0.5)
        ax.set_yticklabels(dims, fontsize=7)
        ax.set_xlabel(xlabel, fontsize=9)
        if ax is axes[0]:
            ax.set_ylabel("# dimensions", fontsize=9)
        ax.set_title(name, fontsize=11, fontweight="bold")
    fig.colorbar(plt.cm.ScalarMappable(norm=norm, cmap=plt.cm.jet),
                 ax=axes, shrink=0.8, label=cbar_label)
    fig.suptitle(title, fontsize=13, fontweight="bold")
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    plt.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close()
    print(f"saved to {save_path}")
    return save_path
