#!/usr/bin/env python
"""Bundle-capacity heatmap, accuracy as f(dims, k) — Schlegel et al. fig-3
style for HRR / unitary / clifford vectors (``scripts/bundle_heatmap.py``)."""

import argparse

import jax

from figures_common import INIT_FNS, plot_heatmaps, run_bundle_heatmap

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n_trials", type=int, default=20)
    p.add_argument("--n_items", type=int, default=1000)
    p.add_argument("--dims", type=int, nargs="+",
                   default=[4, 16, 64, 144, 256, 484, 512, 1024])
    p.add_argument("--out", type=str, default="figures/bundle_heatmap.png")
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="vsa-heatmaps")
    args = p.parse_args()

    k_range = list(range(3, 52, 4))
    key = jax.random.PRNGKey(0)
    results = {}
    for name, fn in INIT_FNS.items():
        print(f"running {name}...")
        results[name] = run_bundle_heatmap(
            fn, name, args.dims, k_range, n_items=args.n_items,
            n_trials=args.n_trials, key=key)
    plot_heatmaps(results, args.dims, k_range, "# bundled vectors",
                  "Bundle Capacity Heatmaps", "accuracy", args.out)
