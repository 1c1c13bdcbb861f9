#!/usr/bin/env python
"""3-D projected samples of the five latent samplers
(``scripts/sample_viz.py:109-182``).

Headless build: ``--save`` is the default (the reference's interactive
kappa/dim sliders require a display; pass ``--interactive`` on a machine
with one)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from cliffordtpu.distributions import (
    CliffordPowerSphericalDistribution,
    CliffordTorusDistribution,
    PowerSpherical,
)

N_SAMPLES = 4000
COLORS = {
    "gaussian (raw)": "#4CAF50",
    "gaussian (L2)": "#9C27B0",
    "powerspherical": "#FF9800",
    "clifford (vM)": "#00BCD4",
    "clifford (PS)": "#2196F3",
}


def sample_gaussian(key, kappa, dim):
    return jax.random.normal(key, (N_SAMPLES, dim))


def sample_powerspherical(key, kappa, dim):
    loc = jnp.zeros(dim).at[0].set(1.0)
    return PowerSpherical(loc, jnp.asarray(kappa)).sample(key, (N_SAMPLES,))


def sample_clifford_vm(key, kappa, dim):
    q = CliffordTorusDistribution(jnp.zeros(dim), jnp.full(dim, kappa))
    return q.sample(key, (N_SAMPLES,))


def sample_clifford_ps(key, kappa, dim):
    q = CliffordPowerSphericalDistribution(jnp.zeros(dim),
                                           jnp.full(dim, kappa))
    return q.sample(key, (N_SAMPLES,))


def normalize(x):
    return x / jnp.clip(jnp.linalg.norm(x, axis=-1, keepdims=True),
                        min=1e-8)


def to_3d(x, key=jax.random.PRNGKey(7)):
    """Random (fixed-seed) orthonormal projection to 3-D."""
    x = np.asarray(x)
    if x.shape[-1] == 3:
        return x
    if x.shape[-1] < 3:
        pad = np.zeros((x.shape[0], 3 - x.shape[-1]))
        return np.concatenate([x, pad], -1)
    proj = np.asarray(jax.random.normal(key, (x.shape[-1], 3)))
    proj, _ = np.linalg.qr(proj)
    return x @ proj


COLUMNS = [
    ("gaussian (raw)", sample_gaussian, False),
    ("gaussian (L2)", sample_gaussian, True),
    ("powerspherical", sample_powerspherical, False),
    ("clifford (vM)", sample_clifford_vm, False),
    ("clifford (PS)", sample_clifford_ps, False),
]


def draw(fig, axes, key, kappa, dim):
    import matplotlib.pyplot as plt  # noqa: F401

    for i, (name, func, do_norm) in enumerate(COLUMNS):
        samples = func(jax.random.fold_in(key, i), kappa, dim)
        pts = to_3d(normalize(samples) if do_norm else samples)
        ax = axes[i]
        ax.cla()
        if name != "gaussian (raw)":
            u = np.linspace(0, 2 * np.pi, 20)
            v = np.linspace(0, np.pi, 20)
            xs = np.outer(np.cos(u), np.sin(v))
            ys = np.outer(np.sin(u), np.sin(v))
            zs = np.outer(np.ones_like(u), np.cos(v))
            ax.plot_wireframe(xs, ys, zs, color="lightgray", alpha=0.3,
                              linewidth=0.3)
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], s=0.5, alpha=0.3,
                   c=COLORS[name], depthshade=True)
        ax.set_title(name, fontsize=11, pad=4)
        lim = (max(np.abs(pts).max() + 0.2, 1.2)
               if name == "gaussian (raw)" else 1.2)
        ax.set_xlim(-lim, lim)
        ax.set_ylim(-lim, lim)
        ax.set_zlim(-lim, lim)
        ax.set_xticklabels([])
        ax.set_yticklabels([])
        ax.set_zticklabels([])
    fig.suptitle(f"samples projected to 3D  (dim={dim}, κ={kappa:.1f})",
                 fontsize=14)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--kappa", type=float, default=5.0)
    p.add_argument("--dim", type=int, default=4)
    p.add_argument("--out", type=str, default="figures/sample_viz.png")
    p.add_argument("--interactive", action="store_true")
    args = p.parse_args()

    import matplotlib

    if not args.interactive:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(22, 5))
    fig.subplots_adjust(wspace=0.02, top=0.88, left=0.02, right=0.98,
                        bottom=0.22 if args.interactive else 0.08)
    axes = [fig.add_subplot(1, 5, i + 1, projection="3d") for i in range(5)]
    key = jax.random.PRNGKey(0)

    if args.interactive:
        from matplotlib.widgets import Slider

        ax_kappa = fig.add_axes([0.15, 0.09, 0.7, 0.03])
        slider_kappa = Slider(ax_kappa, "κ", 0.1, 100.0, valinit=args.kappa,
                              valstep=0.5)
        ax_dim = fig.add_axes([0.15, 0.03, 0.7, 0.03])
        slider_dim = Slider(ax_dim, "dim", 2, 32, valinit=args.dim,
                            valstep=1)

        def _redraw(_):
            draw(fig, axes, key, slider_kappa.val, int(slider_dim.val))
            fig.canvas.draw_idle()

        slider_kappa.on_changed(_redraw)
        slider_dim.on_changed(_redraw)
        draw(fig, axes, key, args.kappa, args.dim)
        plt.show()
    else:
        draw(fig, axes, key, args.kappa, args.dim)
        out_dir = os.path.dirname(args.out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        plt.savefig(args.out, dpi=300, bbox_inches="tight")
        plt.close()
        print(f"saved to {args.out}")
