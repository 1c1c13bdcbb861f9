"""scripts/sweep.py: process-isolated sweeps survive killed trials and
reproduce the in-process runner exactly.

The point of the driver (ROADMAP item 2 / round-1 verdict item 8) is that a
wedged axon TPU session costs one trial, not the sweep — so the core test
kills a trial mid-run (timeout SIGKILL during training) and asserts the
sweep completes, records the failure, and resumes cleanly on re-run.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SWEEP = os.path.join(ROOT, "scripts", "sweep.py")

TINY = ["--epochs", "1", "--warmup_epochs", "1", "--batch_size", "16",
        "--limit_train", "48", "--limit_test", "48",
        "--vsa_trials", "1", "--fid_samples", "32",
        "--cycle_epochs", "2", "--patience", "0"]


def _sweep(outdir, extra, passthrough=TINY):
    cmd = [sys.executable, SWEEP, "--runner", "fashion_train",
           "--outdir", str(outdir), "--distributions", "clifford",
           "--latent_dims", "8", "--seed", "3"] + extra + ["--"] + passthrough
    return subprocess.run(cmd, capture_output=True, text=True, timeout=1800)


def test_sweep_survives_killed_trial_and_resumes(tmp_path):
    # 1) kill the only trial mid-run (5 s is far below the child's
    #    jax-import+compile time) — the sweep must finish, mark it failed,
    #    and still write the summary
    r = _sweep(tmp_path, ["--n_trials", "1", "--trial_timeout", "5"])
    summary = json.loads((tmp_path / "sweep_summary.json").read_text())
    assert summary["n_failed"] == 1 and summary["n_ok"] == 0
    assert summary["trials"][0]["rc"] == 124
    assert r.returncode == 1  # every trial failed

    # 2) resume with 2 trials, no timeout: both cells run fresh (the killed
    #    trial left no metrics.json), artifacts get -trial{n} suffixes, and
    #    the aggregate CSV averages both
    r = _sweep(tmp_path, ["--n_trials", "2"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    summary = json.loads((tmp_path / "sweep_summary.json").read_text())
    assert summary["n_ok"] == 2 and summary["n_failed"] == 0
    for t in (1, 2):
        exp = tmp_path / "results" / f"fashionmnist-clifford-d8-l1-trial{t}"
        assert (exp / "metrics.json").exists()
        assert (exp / "vsa_raw.json").exists()
    csv = (tmp_path / "fashionmnist_results.csv").read_text()
    assert "±" in csv  # 2 trials -> mean±std cells
    timing = json.loads((tmp_path / "fashion_train_timing.json").read_text())
    assert "fashionmnist-clifford-d8-l1-trial1" in timing

    # 3) second resume is a no-op: everything skipped
    r = _sweep(tmp_path, ["--n_trials", "2"])
    assert r.returncode == 0
    summary = json.loads((tmp_path / "sweep_summary.json").read_text())
    assert summary["n_skipped"] == 2 and summary["n_ok"] == 0


def test_shelled_trial_matches_inprocess(tmp_path):
    """A sweep-shelled trial must reproduce the in-process runner trial:
    same RNG stream (stable_hash is cross-process deterministic), same
    synthetic dataset, same artifact names."""
    sub_dir = tmp_path / "shelled"
    r = _sweep(sub_dir, ["--n_trials", "1"])
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    spec = importlib.util.spec_from_file_location(
        "fashion_train", os.path.join(ROOT, "scripts", "fashion_train.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    args = mod.build_parser().parse_args(
        ["--n_trials", "1", "--latent_dims", "8",
         "--distributions", "clifford", "--seed", "3", "--no_wandb",
         "--outdir", str(tmp_path / "inproc")] + TINY)

    from cliffordtpu.runners.cnn_runner import run_cnn_experiments

    cwd = os.getcwd()
    try:
        run_cnn_experiments(args, "fashionmnist", "fashion_train",
                            full_eval=True)
    finally:
        os.chdir(cwd)

    exp = "fashionmnist-clifford-d8-l1"
    m_sub = json.loads(
        (sub_dir / "results" / exp / "metrics.json").read_text())
    m_in = json.loads(
        (tmp_path / "inproc" / "results" / exp / "metrics.json").read_text())
    assert abs(m_sub["final_best_total_loss"]
               - m_in["final_best_total_loss"]) < 1e-4
    assert abs(m_sub["mean_vector_cosine_acc"]
               - m_in["mean_vector_cosine_acc"]) < 1e-6
    v_sub = json.loads(
        (sub_dir / "results" / exp / "vsa_raw.json").read_text())
    v_in = json.loads(
        (tmp_path / "inproc" / "results" / exp / "vsa_raw.json").read_text())
    assert v_sub["bundle_cap"]["k"] == v_in["bundle_cap"]["k"]
    for a, b in zip(v_sub["bundle_cap"]["accuracy"],
                    v_in["bundle_cap"]["accuracy"]):
        assert abs(a - b) < 1e-6
