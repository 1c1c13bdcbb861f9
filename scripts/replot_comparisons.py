#!/usr/bin/env python
"""Regenerate cross-distribution comparison plots from saved vsa_raw.json.

The reference runners dump per-trial ``results/{exp}/vsa_raw.json`` "for
replot_comparisons.py compatibility" (``mnist/mnist_clifpws.py:492``) but the
script itself is absent from the repo; this provides it.  Scans a results
directory, groups trials by (dataset, dist, d), averages curves over trials,
and re-emits ``vsa_comparison_d{d}.png`` per latent dim.

Usage: python scripts/replot_comparisons.py --results_dir results \
          --dataset mnist --out results/comparisons/mnist
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cliffordtpu.eval.tables import plot_cross_dist_comparison_dim

_NAME_RE = re.compile(
    r"^(?P<dataset>[a-z0-9]+)-(?P<dist>[a-z_0-9]+)-d(?P<d>\d+)-"
    r"(?P<loss>[a-z0-9]+)(-trial(?P<trial>\d+))?$")


def _avg_curves(entries, key):
    """Average {'k': [...], 'accuracy': [...]} dicts across trials."""
    ks = None
    accs = []
    for e in entries:
        cur = e.get(key) or {}
        if not cur.get("k"):
            continue
        if ks is None:
            ks = cur["k"]
        if cur["k"] == ks:
            accs.append(cur["accuracy"])
    if ks is None or not accs:
        return None
    return {"k": ks, "accuracy": np.mean(accs, axis=0).tolist()}


def _avg_sims(entries, key):
    vals = None
    sims = []
    for e in entries:
        cur = e.get(key) or {}
        if not cur.get("k_values"):
            continue
        if vals is None:
            vals = cur["k_values"]
        if cur["k_values"] == vals:
            sims.append(cur["k_sims"])
    if vals is None or not sims:
        return [], []
    return np.mean(sims, axis=0).tolist(), vals


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", default="results")
    p.add_argument("--dataset", default=None,
                   help="filter to one dataset prefix (e.g. mnist)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    grouped = defaultdict(lambda: defaultdict(list))  # d -> dist -> entries
    dataset_seen = None
    for name in sorted(os.listdir(args.results_dir)):
        m = _NAME_RE.match(name)
        if not m:
            continue
        if args.dataset and m.group("dataset") != args.dataset:
            continue
        path = os.path.join(args.results_dir, name, "vsa_raw.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            raw = json.load(f)
        dataset_seen = m.group("dataset")
        grouped[int(m.group("d"))][m.group("dist")].append(raw)

    if not grouped:
        print("no vsa_raw.json found")
        return 1

    out_dir = args.out or os.path.join(
        args.results_dir, "comparisons", dataset_seen or "dataset")
    for d, by_dist in sorted(grouped.items()):
        dim_results = {}
        for dist, entries in by_dist.items():
            sims, vals = _avg_sims(entries, "self_binding_star")
            dim_results[dist] = {
                "bundle_cap": _avg_curves(entries, "bundle_cap"),
                "role_filler": _avg_curves(entries, "role_filler"),
                "self_binding_k_sims": sims,
                "self_binding_k_values": vals,
            }
        path = plot_cross_dist_comparison_dim(
            dim_results, d, dataset_seen or "dataset", out_dir)
        print(f"d={d}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
