#!/usr/bin/env python
"""Hypersphere surface-area collapse vs Clifford-torus (2π)^d growth
(``scripts/surface_area_plot.py:1-80``)."""

import argparse
import os

import numpy as np
from scipy.special import gamma


def hypersphere_sa(d):
    """Unit S^(d-1) surface area: 2 pi^(d/2) / Gamma(d/2)."""
    return 2 * np.pi ** (d / 2) / gamma(d / 2)


def gaussian_typical_shell_sa(d):
    """N(0,I) typical-set shell at r = sqrt(d)."""
    return hypersphere_sa(d) * (np.sqrt(d)) ** (d - 1)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, default="figures/surface_area.png")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.rcParams.update({
        "font.size": 12, "font.family": "serif",
        "axes.labelsize": 14, "axes.titlesize": 14,
        "legend.fontsize": 11, "figure.figsize": (8, 5),
    })

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(14, 5))

    mdims_short = np.arange(1, 40)
    sa_sphere_short = np.array([hypersphere_sa(d + 1) for d in mdims_short])
    ax1.semilogy(mdims_short, sa_sphere_short, "b-", linewidth=2,
                 label=r"Power Spherical / vMF")
    ax1.semilogy(mdims_short[::3], sa_sphere_short[::3], "x",
                 color="#9467bd", markersize=7, markeredgewidth=2,
                 label=r"$\mathcal{N}$-L2")
    ax1.axvline(x=6, color="gray", linestyle="--", alpha=0.5,
                label="$d=6$ (peak)")
    ax1.set_xlabel("manifold dimension $d$")
    ax1.set_ylabel("surface area (log scale)")
    ax1.set_title("Hypersphere Surface Area Collapse")
    ax1.legend(fontsize=9)
    ax1.set_xlim(1, 39)

    mdims_comp = np.arange(1, 65)
    sa_sphere_comp = np.array([hypersphere_sa(d + 1) for d in mdims_comp])
    sa_clifford_comp = np.array([(2 * np.pi) ** d for d in mdims_comp])
    sa_gauss_comp = np.array(
        [gaussian_typical_shell_sa(d + 1) for d in mdims_comp])

    ax2.semilogy(mdims_comp, sa_gauss_comp, "-", color="#2ca02c",
                 linewidth=2, label=r"Gaussian")
    ax2.semilogy(mdims_comp, sa_clifford_comp, "r-", linewidth=2,
                 label=r"Clifford Torus $(2\pi)^d$")
    ax2.semilogy(mdims_comp, sa_sphere_comp, "b-", linewidth=2,
                 label=r"Power Spherical / vMF")
    ax2.set_xlabel("manifold dimension $d$")
    ax2.set_ylabel("surface area / volume (log scale)")
    ax2.set_title("Latent Manifold Size vs Dimension")
    ax2.legend(fontsize=9)
    ax2.set_xlim(1, 64)

    plt.tight_layout()
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    plt.savefig(args.out, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"saved to {args.out}")
