#!/usr/bin/env python
"""Role-filler unbinding heatmap — Schlegel et al. fig-7/8 style
(``scripts/rolefiller_heatmap.py``)."""

import argparse

import jax

from figures_common import INIT_FNS, plot_heatmaps, run_rolefiller_heatmap

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n_trials", type=int, default=10)
    p.add_argument("--n_items", type=int, default=1000)
    p.add_argument("--dims", type=int, nargs="+",
                   default=[4, 16, 64, 144, 256, 484, 512, 1024])
    p.add_argument("--out", type=str,
                   default="figures/rolefiller_heatmap.png")
    args = p.parse_args()

    k_range = list(range(2, 31, 2))
    key = jax.random.PRNGKey(0)
    results = {}
    for name, fn in INIT_FNS.items():
        print(f"running {name}...")
        results[name] = run_rolefiller_heatmap(
            fn, name, args.dims, k_range, n_items=args.n_items,
            n_trials=args.n_trials, key=key)
    plot_heatmaps(results, args.dims, k_range, "# pairs",
                  "Role-Filler Unbinding Capacity", "accuracy", args.out)
