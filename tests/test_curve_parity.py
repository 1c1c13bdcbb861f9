"""Golden trained-curve parity vs the live torch reference (CI-sized).

Drives ``scripts/parity_curves.py`` in subprocesses (exact mode flips
``jax_enable_x64`` globally, so it must not run in the test process).
Full-size artifacts live in ``artifacts/parity_curves/``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "parity_curves.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"),
    reason="reference checkout not available")


def _run(tmp_path, *extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, SCRIPT, "--outdir", str(tmp_path), *extra],
        env=env, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    return r


def test_gaussian_exact_curve_parity(tmp_path):
    """Pinned-noise float64 training: identical trajectory ≤1e-3/dim."""
    _run(tmp_path, "--dist", "normal_nol2", "--d", "5", "--epochs", "2",
         "--limit_train", "1024")
    rep = json.loads(
        (tmp_path / "parity_curves_normal_nol2.json").read_text())
    assert rep["pass"]
    # exact mode should be far below the bar — fp64 rounding only
    assert rep["maxdiff_train_total"] < 1e-5


def test_clifford_statistical_curve_parity(tmp_path):
    """Framework-native samplers: ensemble means within seed noise."""
    # 4 seeds: a 2-seed std (ddof=1) underestimates sigma often enough to
    # flake the floor_mult*spread tolerance (observed on val_kl)
    _run(tmp_path, "--dist", "clifford", "--d", "5", "--epochs", "2",
         "--limit_train", "1024", "--n_seeds", "4")
    rep = json.loads(
        (tmp_path / "parity_curves_clifford.json").read_text())
    assert rep["pass"]
