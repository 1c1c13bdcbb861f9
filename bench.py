"""Benchmark harness: flagship train-step throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

* metric: CliffordARVAE (32 px default config, clifford latent) training
  steps/sec at batch 64 — the hot path of ``cnn/fashion_train.py --arch vit``.
* baseline: the PyTorch reference model (cnn/cliffordar_model.py) doing the
  same step on CPU.  Measured once and cached in ``bench_baseline.json``
  (re-measure with --remeasure-baseline); the north-star target is >= 5x
  (BASELINE.json), reported as ``vs_baseline``.

All diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

BATCH = 64
IMG = 32
LATENT = 16
WARMUP_STEPS = 3
MEASURE_STEPS = 30
N_WINDOWS = 3
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
_PROFILE_DIR = None

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_jax(dtype: str = "bfloat16") -> float:
    import jax
    import jax.numpy as jnp

    # persistent compile cache: cuts the ~3 min axon remote compile on
    # repeat runs when the backend supports executable serialization
    # (harmless no-op otherwise)
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception as e:
        log(f"compile cache unavailable: {e}")

    from cliffordtpu.nn import CliffordARVAE
    from cliffordtpu.train.loop import make_cnn_train_step
    from cliffordtpu.train.state import create_train_state

    log(f"jax devices: {jax.devices()}, compute dtype: {dtype}")
    model = CliffordARVAE(
        latent_dim=LATENT, image_size=IMG, in_channels=1,
        distribution="clifford",
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (BATCH, IMG, IMG, 1)) * 2.0 - 1.0
    t0 = time.time()
    state = create_train_state(key, model, x[:2], optimizer="adamw", lr=1e-4)
    step = make_cnn_train_step(model)
    beta = jnp.float32(1.0)
    for i in range(WARMUP_STEPS):
        state, losses = step(state, x, jax.random.fold_in(key, i), beta)
    jax.block_until_ready(losses["total_loss"])
    log(f"compile+warmup: {time.time() - t0:.1f}s, "
        f"loss {float(losses['total_loss']):.3f}")

    import contextlib

    prof = (jax.profiler.trace(_PROFILE_DIR) if _PROFILE_DIR
            else contextlib.nullcontext())
    # The axon relay adds per-dispatch latency that varies with tunnel load
    # (measured 2.5-22 ms/step for the same program); take the best of
    # several windows as the device-throughput estimate.
    best = 0.0
    with prof:
        for w in range(N_WINDOWS):
            t0 = time.time()
            for i in range(MEASURE_STEPS):
                state, losses = step(
                    state, x, jax.random.fold_in(key, 100 + w * 1000 + i),
                    beta)
            jax.block_until_ready(losses["total_loss"])
            dt = time.time() - t0
            sps = MEASURE_STEPS / dt
            log(f"jax window {w}: {MEASURE_STEPS} steps in {dt:.2f}s "
                f"-> {sps:.3f} steps/s")
            best = max(best, sps)
    return best


def measure_torch_baseline(n_steps: int = 3) -> float:
    """Reference CliffordARVAE train step on CPU (same config/batch)."""
    import torch

    sys.path.insert(0, "/root/reference")
    from cnn.cliffordar_model import CliffordARVAE as TorchVAE

    torch.manual_seed(0)
    model = TorchVAE(
        latent_dim=LATENT, image_size=IMG, in_channels=1,
        distribution="clifford", device="cpu",
    )
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    x = torch.rand(BATCH, 1, IMG, IMG) * 2 - 1
    # one warmup step
    t_all = []
    for i in range(n_steps + 1):
        t0 = time.time()
        opt.zero_grad()
        x_recon, q_z, p_z, _ = model(x)
        losses = model.compute_loss(x, x_recon, q_z, p_z, beta=1.0)
        losses["total_loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if i > 0:
            t_all.append(time.time() - t0)
        log(f"torch step {i}: {time.time() - t0:.1f}s")
    sps = 1.0 / (sum(t_all) / len(t_all))
    return sps


def get_baseline(remeasure: bool = False) -> float:
    if not remeasure and os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
        if data.get("batch") == BATCH and data.get("img") == IMG:
            return data["torch_cpu_steps_per_sec"]
    log("measuring torch CPU baseline ...")
    sps = measure_torch_baseline()
    with open(BASELINE_FILE, "w") as f:
        json.dump(
            {
                "torch_cpu_steps_per_sec": sps,
                "batch": BATCH,
                "img": IMG,
                "latent": LATENT,
                "model": "cnn/cliffordar_model.py CliffordARVAE 32px clifford",
                "hardware": "1-core CPU (reference runs on CPU per BASELINE.md)",
            },
            f, indent=2,
        )
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace of the measured steps")
    args = ap.parse_args()
    if args.profile:
        global _PROFILE_DIR
        _PROFILE_DIR = args.profile

    jax_sps = measure_jax(args.dtype)
    if args.skip_baseline:
        baseline = None
    else:
        try:
            baseline = get_baseline(args.remeasure_baseline)
        except Exception as e:  # torch baseline is best-effort
            log(f"baseline measurement failed: {e}")
            baseline = None

    out = {
        "metric": "cliffordar_vae_train_steps_per_sec_b64_32px",
        "value": round(jax_sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(jax_sps / baseline, 2) if baseline else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
