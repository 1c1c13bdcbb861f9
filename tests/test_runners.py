"""Runner-level smoke tests.

Regression for the round-1 advisor finding: ``stage()`` in
``cliffordtpu/runners/cnn_runner.py`` recursed into itself on the default
(no ``--eval_subprocess``) path, crashing every sweep after training.  This
drives ``run_cnn_experiments`` end-to-end in-process at a tiny config and
checks the artifact contract (metrics.json / vsa_raw.json / CSV / timing).
"""

from __future__ import annotations

import importlib.util
import json
import math
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cnn_runner_inprocess_smoke(tmp_path):
    """Full sweep loop (train + in-process eval battery) at a tiny config."""
    fashion_train = _load_script("fashion_train")
    args = fashion_train.build_parser().parse_args([
        "--epochs", "1", "--warmup_epochs", "1", "--batch_size", "16",
        "--n_trials", "1", "--latent_dims", "8",
        "--distributions", "clifford",
        "--limit_train", "64", "--limit_test", "64",
        "--vsa_trials", "1", "--fid_samples", "64",
        "--no_wandb", "--outdir", str(tmp_path),
        "--cycle_epochs", "2", "--patience", "0",
    ])

    from cliffordtpu.runners.cnn_runner import run_cnn_experiments

    cwd = os.getcwd()
    try:
        run_cnn_experiments(args, "fashionmnist", "smoke", full_eval=False)
    finally:
        os.chdir(cwd)

    exp_dir = tmp_path / "results" / "fashionmnist-clifford-d8-l1"
    metrics = json.loads((exp_dir / "metrics.json").read_text())
    assert math.isfinite(metrics["final_best_total_loss"])
    vsa = json.loads((exp_dir / "vsa_raw.json").read_text())
    assert set(vsa) == {"bundle_cap", "role_filler", "self_binding_star",
                        "self_binding_dagger"}
    # the eval battery must actually have run (not defaults): the bundle
    # capacity curve is non-empty when stage() delegates to safe_eval
    assert vsa["bundle_cap"].get("k"), (
        "bundle capacity returned the empty default — eval stages did "
        "not execute")
    assert (tmp_path / "fashionmnist_results.csv").exists()
    assert (tmp_path / "smoke_timing.json").exists()


def test_mlp_runner_vmap_trials_train_only(tmp_path):
    """--vmap_trials + --train_only end-to-end: both lanes train in one
    vmapped program, eval stages take their defaults, artifact contract
    (per-trial dirs, CSV, timing JSON) still holds."""
    mnist_clifpws = _load_script("mnist_clifpws")
    args = mnist_clifpws.build_parser().parse_args([
        "--d_dims", "2", "--n_runs", "2", "--epochs", "2",
        "--warmup_epochs", "1", "--patience", "5", "--batch_size", "32",
        "--limit_train", "128", "--limit_test", "32",
        "--distributions", "clifford", "--no_wandb",
        "--vmap_trials", "--train_only", "--outdir", str(tmp_path),
    ])
    cwd = os.getcwd()
    try:
        mnist_clifpws.run(args)
    finally:
        os.chdir(cwd)

    for t in (1, 2):
        m = json.loads(
            (tmp_path / "results" / f"mnist-clifford-d2-l1-trial{t}"
             / "metrics.json").read_text())
        assert math.isfinite(m["final_val_loss"])  # training really ran
        assert math.isnan(m["test/ll"])            # eval really skipped
    assert (tmp_path / "mnist_vae_results.csv").exists()
    assert (tmp_path / "mnist_clifpws_timing.json").exists()
