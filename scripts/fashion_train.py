#!/usr/bin/env python
"""FashionMNIST CNN/ViT/Hybrid VAE sweep — JAX rebuild of
``cnn/fashion_train.py:675-1513`` (flags and artifacts preserved; engine in
``cliffordtpu/runners/cnn_runner.py``)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins the platform to the TPU tunnel regardless of
# JAX_PLATFORMS; re-assert the user's choice so CPU smoke runs stay on CPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cliffordtpu.runners.cnn_runner import run_cnn_experiments


def build_parser():
    p = argparse.ArgumentParser(
        description="clifford vae experiments on fashionmnist")
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--require_real", action="store_true",
                   help="abort instead of training on the synthetic "
                        "fallback when no real dataset files are found")
    p.add_argument("--warmup_epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--no-l2_norm", dest="l2_norm", action="store_false")
    p.set_defaults(l2_norm=True)
    p.add_argument("--recon_loss", type=str, default="l1",
                   choices=["mse", "l1"])
    p.add_argument("--l1_weight", type=float, default=1.0)
    p.add_argument("--max_beta", type=float, default=1.0)
    p.add_argument("--min_beta", type=float, default=0.1)
    p.add_argument("--use_learnable_beta", action="store_true")
    p.add_argument("--no_wandb", action="store_true")
    p.add_argument("--keep_ckpts", action="store_true")
    p.add_argument("--wandb_project", type=str,
                   default="clifford-experiments-CNN")
    p.add_argument("--patience", type=int, default=50)
    p.add_argument("--cycle_epochs", type=int, default=250)
    p.add_argument("--n_trials", type=int, default=30)
    p.add_argument("--exclude_class", type=int, default=-1)
    p.add_argument("--latent_dims", type=int, nargs="+",
                   default=[128, 256, 512, 1024, 2048, 4096])
    p.add_argument("--braid", action="store_true")
    p.add_argument("--distributions", type=str, nargs="+", default=None,
                   choices=["clifford", "powerspherical", "gaussian",
                            "gaussian_nol2"])
    p.add_argument("--start_trial", type=int, default=1)
    p.add_argument("--arch", type=str, default="cnn",
                   choices=["cnn", "vit", "hybrid"])
    p.add_argument("--dataset", type=str, default="fashionmnist",
                   choices=["fashionmnist", "mnist32"],
                   help="mnist32 = the MNIST digit files at this runner's "
                        "32px/[-1,1] geometry, so the committed real-digit "
                        "shard can train the CNN/ViT/Hybrid families "
                        "(framework extension; the reference runner is "
                        "fashion-only)")
    # extensions (defaults preserve reference behavior)
    p.add_argument("--outdir", type=str, default=".")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--limit_train", type=int, default=None)
    p.add_argument("--limit_test", type=int, default=None)
    p.add_argument("--vsa_trials", type=int, default=20)
    p.add_argument("--iwae_samples", type=int, default=0,
                   help="if > 0, also report an IWAE-K test log-likelihood\n                   bound (framework extension; reference has IWAE only\n                   for the MLP runners)")
    p.add_argument("--fid_samples", type=int, default=2048)
    p.add_argument("--eval_subprocess", action="store_true",
                   help="run the eval battery in a fresh CPU-only process "
                        "(recommended on the axon TPU; see CLAUDE.md)")
    p.add_argument("--mesh", type=str, default=None,
                   help="train under pjit on a ('data','model') device "
                        "mesh: 'dp' = all local devices data-parallel, "
                        "'N' = N-way DP, 'NxM' = DP x TP (batch_size must "
                        "divide by N). Default: single device, like the "
                        "reference (cnn/fashion_train.py:46-50)")
    p.add_argument("--mesh_mode", type=str, default="replicated",
                   choices=["replicated", "fsdp"],
                   help="param placement under --mesh: replicated (DP/TP) "
                        "or fsdp (ZeRO-3: params+moments sharded over the "
                        "data axis)")
    p.add_argument("--scan_layers", dest="scan_layers_model",
                   action="store_true",
                   help="(vit arch) compile the ViT stacks as ONE lax.scan "
                        "over layer-stacked weights: slower per step on "
                        "v5e at flagship sizes but much faster to compile "
                        "(BASELINE.md); checkpoints are NOT interchangeable "
                        "with the unrolled form")
    p.add_argument("--fused_proj", action="store_true",
                   help="(vit arch) fuse q/k/v into one wqkv matmul and "
                        "SwiGLU w1/w3 into one w13 matmul (identical math, "
                        "fewer MXU kernel launches); checkpoints in either "
                        "layout interconvert exactly on load")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="accumulate (average) gradients over N microbatch "
                        "steps before each optimizer update (effective "
                        "batch = N x batch_size; optax.MultiSteps)")
    p.add_argument("--scan_epochs", action="store_true",
                   help="compile each training epoch as ONE lax.scan "
                        "program (device-bound throughput on slow hosts; "
                        "same losses as the per-step path)")
    p.add_argument("--force_trial_suffix", action="store_true",
                   help="always append -trial{n} to artifact names (used by "
                        "scripts/sweep.py so a shelled single-trial process "
                        "names artifacts like the in-process sweep)")
    return p


if __name__ == "__main__":
    from cliffordtpu.utils.tpu_lock import hold_tpu_lock

    args = build_parser().parse_args()
    if args.distributions is None:
        args.distributions = ["clifford", "powerspherical", "gaussian",
                              "gaussian_nol2"]
    # one TPU client process at a time (axon revokes concurrent sessions
    # and parallel trainers contaminate timings — ROADMAP round-4 s5/s6);
    # held for process lifetime, no-op when this process is CPU-pinned
    _tpu_lock = hold_tpu_lock(label="fashion_train")
    run_cnn_experiments(args, args.dataset, "fashion_train",
                        full_eval=True)
