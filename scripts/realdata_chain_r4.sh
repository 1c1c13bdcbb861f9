#!/bin/bash
# Round-4 stage 2: real-data artifact trees on TPU (VERDICT r3 #2) and the
# across-dims MLP sweep (VERDICT r3 #3).  Run STRICTLY SOLO after
# scripts/bench_chain_r4.sh finishes.  All outputs are repo artifacts.
set -u
cd /root/repo
OUT=artifacts/bench_r4
LOG="$OUT/realdata.log"
say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== realdata chain start ==="
timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
  || { say "tunnel dead at start; aborting"; exit 3; }

# ---- CNN/ViT/Hybrid trees: ALL families in ONE invocation per arch ----
# (merge-on-write writers landed r4; one invocation matches the
# reference's unified-CSV contract, cnn/fashion_train.py:1382-1410)
for arch in cnn vit hybrid; do
  say "RUN mnist32 $arch (all 4 families, d=128, 60 epochs)"
  timeout 14400 python scripts/fashion_train.py \
    --dataset mnist32 --arch "$arch" --latent_dims 128 \
    --epochs 60 --n_trials 1 --eval_subprocess --scan_epochs \
    --outdir "artifacts/real_digits_${arch}_tpu" \
    >> "$LOG" 2>&1 && say "OK mnist32 $arch" || say "FAIL mnist32 $arch rc=$?"
done

# ---- across-dims MLP sweep: the paper's headline table on real data ----
# d_dims x 4 dists x 8 runs, vmapped lanes, heavy VSA battery on the
# first 2 runs per cell, table metrics on all (ref mnist_clifpws.py:659-698)
say "RUN across-dims sweep"
timeout 36000 python scripts/mnist_clifpws.py \
  --d_dims 2 5 10 20 40 --n_runs 8 --epochs 60 \
  --vmap_trials --full_eval_runs 2 --eval_subprocess \
  --outdir artifacts/across_dims_mnist \
  >> "$LOG" 2>&1 && say "OK across-dims" || say "FAIL across-dims rc=$?"

say "=== REALDATA CHAIN DONE ==="
