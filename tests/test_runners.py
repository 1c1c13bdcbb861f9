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

    # merge-on-write (round-3 verdict weak #2/#5): a second per-family
    # invocation into the SAME artifact dir must aggregate with — not
    # clobber — the clifford artifacts written above
    args2 = fashion_train.build_parser().parse_args([
        "--epochs", "1", "--warmup_epochs", "1", "--batch_size", "16",
        "--n_trials", "1", "--latent_dims", "8",
        "--distributions", "gaussian",
        "--limit_train", "64", "--limit_test", "64",
        "--vsa_trials", "1", "--fid_samples", "64",
        "--no_wandb", "--outdir", str(tmp_path),
        "--cycle_epochs", "2", "--patience", "0",
    ])
    cwd = os.getcwd()
    try:
        run_cnn_experiments(args2, "fashionmnist", "smoke", full_eval=False)
    finally:
        os.chdir(cwd)

    csv_text = (tmp_path / "fashionmnist_results.csv").read_text()
    assert "clifford" in csv_text and "gaussian" in csv_text, (
        "per-family invocation clobbered the unified CSV instead of "
        "aggregating")
    timing = json.loads((tmp_path / "smoke_timing.json").read_text())
    assert any("clifford" in k for k in timing) and any(
        "gaussian" in k for k in timing), (
        "per-family invocation dropped the sibling family's timings")
    dim_data = json.loads(
        (tmp_path / "results" / "comparisons" / "fashionmnist"
         / "dim8_data.json").read_text())
    assert "clifford" in dim_data and "gaussian" in dim_data


def test_merge_across_dims_unit(tmp_path):
    """_merge_across_dims: dim-groups replace, siblings survive, trial
    multiplicity per dim is preserved."""
    from cliffordtpu.runners.cnn_runner import _merge_across_dims

    path = str(tmp_path / "across.json")
    first = {"clifford": {"dims": [8, 8, 16], "knn_100": [0.1, 0.2, 0.3],
                          "mean_cosine": [0.5, 0.6, 0.7]}}
    _merge_across_dims(path, first)
    # second invocation: different family + re-run of clifford d=8 only
    second = {
        "gaussian": {"dims": [8], "knn_100": [0.9], "mean_cosine": [0.4]},
        "clifford": {"dims": [8], "knn_100": [0.15], "mean_cosine": [0.55]},
    }
    merged = _merge_across_dims(path, second)
    assert set(merged) == {"clifford", "gaussian"}
    # clifford d=8 group replaced (2 trials -> 1), d=16 group preserved
    assert merged["clifford"]["dims"] == [8, 16]
    assert merged["clifford"]["knn_100"] == [0.15, 0.3]
    assert merged["gaussian"]["dims"] == [8]
    # reload path round-trips
    assert json.loads(open(path).read()) == merged


def test_sidecar_corruption_preserved_not_silently_reset(tmp_path):
    """A truncated sidecar (e.g. a pre-atomic-write kill landed mid-dump)
    must be preserved as .corrupt — silently treating it as {} would
    discard every previously merged sweep slice — and the next merge
    must start fresh without crashing."""
    from cliffordtpu.utils.artifacts import load_json, merge_json_write

    path = str(tmp_path / "side.json")
    with open(path, "w") as f:
        f.write('{"clifford": {"dims": [8], "knn_100"')  # truncated
    assert load_json(path) == {}
    corrupt = tmp_path / "side.json.corrupt"
    assert corrupt.exists()
    assert corrupt.read_text().startswith('{"clifford"')
    merged = merge_json_write(path, {"gaussian": 1})
    assert merged == {"gaussian": 1}
    assert json.loads(open(path).read()) == merged


def test_merge_writes_are_atomic_no_tmp_droppings(tmp_path):
    """merge writers go through write-to-temp + rename (timeout-kill
    safety the sweep chains rely on) and clean their temp files up."""
    import os

    from cliffordtpu.utils.artifacts import merge_across_dims, \
        merge_json_write

    path = str(tmp_path / "side.json")
    merge_json_write(path, {"a": 1})
    merge_across_dims(str(tmp_path / "across.json"),
                      {"clifford": {"dims": [8], "knn_100": [0.5]}})
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp." in f]
    assert leftovers == []
    assert json.loads(open(path).read()) == {"a": 1}


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


def test_mlp_runner_full_eval_runs_gates_battery(tmp_path):
    """--full_eval_runs 1 with n_runs 2: run 1 gets the heavy VSA battery
    (non-empty capacity curves), run 2 keeps only the table-feeding eval
    (knn/mvc/test metrics present, curves empty) — the sweep-mode
    contract behind the across-dims table (VERDICT r3 #3)."""
    mnist_clifpws = _load_script("mnist_clifpws")
    args = mnist_clifpws.build_parser().parse_args([
        "--d_dims", "2", "--n_runs", "2", "--epochs", "2",
        "--warmup_epochs", "1", "--patience", "5", "--batch_size", "32",
        "--limit_train", "128", "--limit_test", "48",
        "--distributions", "clifford", "--no_wandb", "--vsa_trials", "2",
        "--vmap_trials", "--full_eval_runs", "1",
        "--outdir", str(tmp_path),
    ])
    cwd = os.getcwd()
    try:
        mnist_clifpws.run(args)
    finally:
        os.chdir(cwd)

    vsa1 = json.loads(
        (tmp_path / "results" / "mnist-clifford-d2-l1-trial1"
         / "vsa_raw.json").read_text())
    vsa2 = json.loads(
        (tmp_path / "results" / "mnist-clifford-d2-l1-trial2"
         / "vsa_raw.json").read_text())
    assert vsa1["bundle_cap"]["k"], "run 1 must carry the real battery"
    assert not vsa2["bundle_cap"]["k"], "run 2 must skip the battery"
    for t in (1, 2):
        m = json.loads(
            (tmp_path / "results" / f"mnist-clifford-d2-l1-trial{t}"
             / "metrics.json").read_text())
        # table metrics always present
        assert math.isfinite(m["final_val_loss"])
        assert math.isfinite(m["test/ll"])
        assert any(k.startswith("knn_acc") for k in m)
        assert "mean_vector_cosine_acc" in m
