#!/usr/bin/env python
"""Binding-depth heatmap — Schlegel et al. fig-6 style
(``scripts/binding_depth_heatmap.py``)."""

import argparse

import jax

from figures_common import INIT_FNS, plot_heatmaps, run_depth_heatmap

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n_trials", type=int, default=10)
    p.add_argument("--max_depth", type=int, default=40)
    p.add_argument("--dims", type=int, nargs="+",
                   default=[4, 16, 64, 144, 256, 484, 512, 1024])
    p.add_argument("--out", type=str,
                   default="figures/binding_depth_heatmap.png")
    args = p.parse_args()

    key = jax.random.PRNGKey(0)
    results = {}
    depths = None
    for name, fn in INIT_FNS.items():
        print(f"running {name}...")
        results[name], depths = run_depth_heatmap(
            fn, name, args.dims, max_depth=args.max_depth,
            n_trials=args.n_trials, key=key)
    plot_heatmaps(results, args.dims, depths, "binding depth $m$",
                  "Approximate Inverse Binding Depth", "cosine similarity",
                  args.out)
