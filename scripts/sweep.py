#!/usr/bin/env python
"""Process-isolated sweep driver: one trial per runner process.

On the axon TPU a wedged session (sporadic UNIMPLEMENTED RPCs, see
CLAUDE.md) poisons the whole in-process sweep; here each
(latent_dim, distribution, trial) cell runs as ONE fresh runner process
(``--n_trials 1 --start_trial T``, the reference's manual-resume mechanism
at ``cnn/fashion_train.py:1499-1504``), so a crashed/killed/wedged trial
costs exactly that trial.  Afterwards the driver aggregates every
``results/{exp}/metrics.json`` it can find into the same unified CSV,
across-dims LaTeX/CSV and cross-dist comparison plots the in-process sweep
(``cliffordtpu/runners/cnn_runner.py``) would have produced, and writes a
``sweep_summary.json`` with per-trial status.

Per-trial artifact names, RNG streams (``fold_in(PRNGKey(seed),
stable_hash(d, dist, trial))``) and synthetic datasets are all
cross-process deterministic, so a shelled sweep is bit-identical to the
in-process one — asserted by tests/test_sweep.py.

Usage:
  python scripts/sweep.py --runner fashion_train --outdir /tmp/sweep \
      --distributions clifford gaussian --latent_dims 128 --n_trials 2 \
      -- --epochs 3 --limit_train 512 --limit_test 256 --eval_subprocess

Everything after ``--`` is passed through to the runner unchanged.
Re-running the same command resumes: trials whose metrics.json already
exists are skipped (``--no_resume`` forces re-runs).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNNERS = {
    "fashion_train": "fashionmnist",
    "cifar10_train": "cifar10",
}


def build_parser():
    p = argparse.ArgumentParser(
        description="one-trial-per-process sweep driver (resume-safe)")
    p.add_argument("--runner", required=True, choices=sorted(RUNNERS))
    p.add_argument("--dataset", default=None,
                   help="override the runner's default dataset (e.g. "
                        "mnist32 on fashion_train for the real digit "
                        "shard); keeps artifact naming consistent")
    p.add_argument("--outdir", required=True)
    p.add_argument("--distributions", type=str, nargs="+", required=True)
    p.add_argument("--latent_dims", type=int, nargs="+", required=True)
    p.add_argument("--n_trials", type=int, default=1)
    p.add_argument("--start_trial", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--recon_loss", type=str, default="l1",
                   help="must match the runner's recon loss (artifact names "
                        "embed it)")
    p.add_argument("--trial_timeout", type=int, default=0,
                   help="per-trial wall-clock limit in seconds (0 = none); "
                        "a timed-out trial is killed and marked failed")
    p.add_argument("--retries", type=int, default=0,
                   help="re-run a failed trial up to N times")
    p.add_argument("--no_resume", action="store_true",
                   help="re-run trials even when their metrics.json exists")
    p.add_argument("--dry_run", action="store_true",
                   help="print the per-trial commands without running")
    return p


def trial_cells(args):
    """Sweep order identical to run_cnn_experiments: dim -> dist -> trial."""
    for latent_dim in args.latent_dims:
        for dist_name in args.distributions:
            for trial in range(args.n_trials):
                yield latent_dim, dist_name, trial + args.start_trial


def exp_name_for(args, dataset, latent_dim, dist_name, trial_num):
    """Mirror the naming in run_cnn_experiments (incl. the no-suffix case
    for a genuinely single-trial sweep)."""
    total_multi = args.n_trials > 1 or args.start_trial > 1
    suffix = f"-trial{trial_num}" if total_multi else ""
    return f"{dataset}-{dist_name}-d{latent_dim}-{args.recon_loss}{suffix}"


def build_cmd(args, passthrough, latent_dim, dist_name, trial_num):
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          f"{args.runner}.py")
    cmd = [
        sys.executable, script,
        "--outdir", args.outdir,
        "--distributions", dist_name,
        "--latent_dims", str(latent_dim),
        "--n_trials", "1",
        "--start_trial", str(trial_num),
        "--seed", str(args.seed),
        "--recon_loss", args.recon_loss,
        "--no_wandb",
    ]
    if args.dataset:
        cmd += ["--dataset", args.dataset]
    if args.n_trials > 1 or args.start_trial > 1:
        # single-trial child must still name artifacts -trial{n}
        cmd.append("--force_trial_suffix")
    return cmd + list(passthrough)


def run_trial(cmd, timeout, log_path):
    """Run one trial process, streaming output to a log file.  Returns
    (rc, seconds); rc -9/-15 etc. for killed children, 124 for timeout."""
    t0 = time.time()
    with open(log_path, "w") as log:
        try:
            r = subprocess.run(cmd, stdout=log, stderr=subprocess.STDOUT,
                               timeout=timeout or None)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            rc = 124
    return rc, time.time() - t0


def merge_timing(outdir, runner, cumulative):
    """The child overwrites {runner}_timing.json per invocation; fold its
    per-experiment keys into the sweep-wide dict after every trial."""
    path = os.path.join(outdir, f"{runner}_timing.json")
    try:
        with open(path) as fh:
            t = json.load(fh)
        for k, v in t.items():
            if k != "total_script_time_s":
                cumulative[k] = v
    except (OSError, json.JSONDecodeError):
        pass


def _fmt(vals, scale=1.0, prec=1):
    if not vals:
        return "N/A"
    import numpy as np

    vals = [v * scale for v in vals]
    if len(vals) > 1:
        return f"{np.mean(vals):.{prec}f}±{np.std(vals):.{prec}f}"
    return f"{vals[0]:.{prec}f}"


def aggregate(args, dataset, statuses):
    """Rebuild the unified CSV + across-dims table + cross-dist plots from
    the per-trial metrics.json files (same formats as run_cnn_experiments
    and scripts/replot_comparisons.py)."""
    import pandas as pd

    trial_metrics = {}
    across = {d: {"knn_100": [], "knn_600": [], "knn_1000": [],
                  "f1_100": [], "f1_600": [], "f1_1000": [],
                  "mean_cosine": [], "dims": []}
              for d in args.distributions}
    for latent_dim, dist_name, trial_num in trial_cells(args):
        exp = exp_name_for(args, dataset, latent_dim, dist_name, trial_num)
        mpath = os.path.join(args.outdir, "results", exp, "metrics.json")
        if not os.path.exists(mpath):
            continue
        with open(mpath) as fh:
            m = json.load(fh)
        trial_metrics.setdefault((latent_dim, dist_name), []).append(m)
        for kk, mk in [("knn_100", "knn_acc_100"), ("knn_600", "knn_acc_600"),
                       ("knn_1000", "knn_acc_1000"), ("f1_100", "knn_f1_100"),
                       ("f1_600", "knn_f1_600"), ("f1_1000", "knn_f1_1000")]:
            across[dist_name][kk].append(m.get(mk, 0.0))
        across[dist_name]["mean_cosine"].append(
            m.get("mean_vector_cosine_acc", 0.0))
        across[dist_name]["dims"].append(latent_dim)

    rows = []
    for (ldim, dist), trials in sorted(trial_metrics.items(),
                                       key=lambda kv: (kv[0][0], kv[0][1])):
        row = {"d": ldim, "dist": dist}
        for metric in ["knn_acc_100", "knn_acc_600", "knn_acc_1000",
                       "knn_f1_100", "knn_f1_600", "knn_f1_1000"]:
            row[metric] = _fmt([t.get(metric, 0.0) for t in trials],
                               scale=100)
        row["mvc"] = _fmt([t.get("mean_vector_cosine_acc", 0.0)
                           for t in trials], scale=100)
        fid_vals = [t["generation_fid"] for t in trials
                    if "generation_fid" in t
                    and not math.isnan(t["generation_fid"])]
        row["fid"] = _fmt(fid_vals)
        row["best_loss"] = _fmt([t.get("final_best_total_loss", float("nan"))
                                 for t in trials], prec=4)
        rows.append(row)

    csv_path = os.path.join(args.outdir, f"{dataset}_results.csv")
    if rows:
        df = pd.DataFrame(rows)
        df.to_csv(csv_path, index=False)
        print(f"\n{'=' * 25} {dataset} results {'=' * 25}")
        print(df.to_string(index=False))
        print(f"saved to {csv_path}")

    comp_dir = os.path.join(args.outdir, "results", "comparisons", dataset)
    if any(len(v["dims"]) for v in across.values()):
        try:
            from cliffordtpu.eval.tables import plot_across_dims_comparison

            path = plot_across_dims_comparison(
                across, sorted(set(args.latent_dims)), dataset, comp_dir)
            print(f"saved across-dims comparison to {path}")
        except Exception as e:  # aggregation must never kill the sweep
            print(f"warning: across-dims comparison failed: {e}")

    # per-dim cross-dist plots from saved vsa_raw.json (averaged over trials)
    replot = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "replot_comparisons.py")
    r = subprocess.run(
        [sys.executable, replot,
         "--results_dir", os.path.join(args.outdir, "results"),
         "--dataset", dataset, "--out", comp_dir],
        capture_output=True, text=True)
    print(r.stdout.strip() or f"replot rc={r.returncode}")

    summary = {
        "runner": args.runner,
        "dataset": dataset,
        "seed": args.seed,
        "trials": statuses,
        "n_ok": sum(1 for s in statuses if s["status"] == "ok"),
        "n_failed": sum(1 for s in statuses if s["status"] == "failed"),
        "n_skipped": sum(1 for s in statuses if s["status"] == "skipped"),
        "csv": csv_path if rows else None,
    }
    spath = os.path.join(args.outdir, "sweep_summary.json")
    with open(spath, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(f"sweep summary: {summary['n_ok']} ok, {summary['n_failed']} "
          f"failed, {summary['n_skipped']} skipped -> {spath}")
    return summary


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        argv, passthrough = argv[:split], argv[split + 1:]
    else:
        passthrough = []
    args = build_parser().parse_args(argv)
    if args.dataset and args.runner != "fashion_train":
        # cifar10_train defines no --dataset flag; every child would die
        # at argparse with rc=2 after burning the retry budget
        print(f"error: --dataset is only supported by the fashion_train "
              f"runner (got --runner {args.runner})", file=sys.stderr)
        return 2
    dataset = args.dataset or RUNNERS[args.runner]
    os.makedirs(os.path.join(args.outdir, "logs"), exist_ok=True)

    cumulative_timing = {}
    statuses = []
    t_start = time.time()
    for latent_dim, dist_name, trial_num in trial_cells(args):
        exp = exp_name_for(args, dataset, latent_dim, dist_name, trial_num)
        mpath = os.path.join(args.outdir, "results", exp, "metrics.json")
        entry = {"exp": exp, "latent_dim": latent_dim, "dist": dist_name,
                 "trial": trial_num}
        if not args.no_resume and os.path.exists(mpath):
            print(f"[skip] {exp} (metrics.json exists)")
            statuses.append({**entry, "status": "skipped"})
            continue
        cmd = build_cmd(args, passthrough, latent_dim, dist_name, trial_num)
        if args.dry_run:
            print("[dry]", " ".join(cmd))
            statuses.append({**entry, "status": "dry"})
            continue
        log_path = os.path.join(args.outdir, "logs", f"{exp}.log")
        for attempt in range(args.retries + 1):
            print(f"[run ] {exp} (attempt {attempt + 1})")
            rc, secs = run_trial(cmd, args.trial_timeout, log_path)
            ok = rc == 0 and os.path.exists(mpath)
            merge_timing(args.outdir, args.runner, cumulative_timing)
            if ok:
                break
            print(f"[fail] {exp}: rc={rc} after {secs:.1f}s "
                  f"(log: {log_path})")
        statuses.append({**entry,
                         "status": "ok" if ok else "failed",
                         "rc": rc, "seconds": round(secs, 1),
                         "log": log_path})
        state = "ok" if ok else "FAILED"
        print(f"[{state:>4}] {exp} in {secs:.1f}s")

    if not args.dry_run:
        cumulative_timing["total_script_time_s"] = time.time() - t_start
        with open(os.path.join(args.outdir,
                               f"{args.runner}_timing.json"), "w") as fh:
            json.dump(cumulative_timing, fh, indent=2)
        aggregate(args, dataset, statuses)
    # exit code: 0 all ok, 1 every trial failed, 2 partial failures — so a
    # driver/CI can detect incomplete sweeps without parsing the logs
    n_failed = sum(1 for s in statuses if s["status"] == "failed")
    if not n_failed:
        return 0
    return 1 if n_failed == len(statuses) else 2


if __name__ == "__main__":
    sys.exit(main())
