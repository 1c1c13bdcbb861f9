#!/bin/bash
# Round-4 stage 3: post-contamination recovery chain.
#
# At 14:30-17:39Z the round ran TWO supervisors at once: the stale
# chain-1d (launched before the synthetic-data fix, gated on the OLD
# vit pid, which died at 14:36) raced chain 1e.  Consequences, all
# handled before this chain launches:
#   - chain 1d's hybrid tree + across-dims sweep trained on the
#     synthetic glyph fallback (no CLIFFORDTPU_DATA_DIR, no
#     --require_real) -> killed + purged at 17:40Z.
#   - every chain-1e measurement in 15:49-16:45Z (sampler A/Bs, eval
#     battery) shared the chip with chain 1d's hybrid training ->
#     those numbers are CONTAMINATED.  The only clean sampler A/Bs are
#     chain 1d's own 14:37-14:45Z solo window (base 135.9/133.6,
#     keyed 128.7/132.8 steps/s -> keyed is a WASH, not -26%), and
#     pallas_rng has never run clean post-fix (f191538).
#
# This chain, strictly one TPU process at a time:
#   1. wait for the orphaned vit stage (pid $VIT_PID) to exit
#   2. clean solo sampler A/Bs at cnn4096 (2 interleaved reps,
#      base/keyed/rng) - replaces the contaminated verdict data
#   3. hybrid real-data tree (VERDICT r3 #2; the purged one was synthetic)
#   4. across-dims MLP sweep (VERDICT r3 #3) with all remaining time;
#      per-dim merge-on-write makes the deadline timeout safe
#
# Launch: VIT_PID=<pid> DEADLINE_EPOCH=<unix s> nohup setsid bash scripts/bench_chain_r4f.sh
set -u
cd /root/repo
export CLIFFORDTPU_DATA_DIR=/root/repo/tests/data
OUT=artifacts/bench_r4
LOG="$OUT/chain_f.log"
RUNS="$OUT/runs.jsonl"
VIT_PID=${VIT_PID:?set VIT_PID to the orphaned vit-stage python pid}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix s) to free the TPU before round end}

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
remain() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

say "=== chain 1f start (vit pid $VIT_PID, deadline $(date -u -d @"$DEADLINE_EPOCH" +%H:%M:%S)Z) ==="

# ---- 1. wait for the vit stage to release the TPU ----
while kill -0 "$VIT_PID" 2>/dev/null; do sleep 60; done
say "vit stage exited (artifacts/real_digits_vit_tpu)"
sleep 30
timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
  && say "tunnel probe OK" || say "WARN tunnel probe failed post-vit; continuing"

run_bench() {
  local tag="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  say "RUN $tag: env=${envs[*]:-} args=$*"
  local t0=$(date +%s)
  local out
  out=$(env ${envs[@]+"${envs[@]}"} timeout 2400 python bench.py --skip-baseline "$@" 2>>"$LOG")
  local rc=$?
  local t1=$(date +%s)
  if [ $rc -ne 0 ] || [ -z "$out" ]; then
    say "FAIL $tag rc=$rc ($((t1-t0))s)"
    echo "{\"tag\": \"$tag\", \"error\": \"rc=$rc\", \"wall_s\": $((t1-t0))}" >> "$RUNS"
    return 1
  fi
  BENCH_OUT="$out" python - "$tag" $((t1-t0)) <<'PYEOF' >> "$RUNS"
import json, os, sys
line = os.environ["BENCH_OUT"].strip().splitlines()[-1]
d = json.loads(line)
d["tag"] = sys.argv[1]; d["wall_s"] = int(sys.argv[2])
print(json.dumps(d))
PYEOF
  say "OK $tag ($((t1-t0))s): $out"
}

# ---- 2. CLEAN solo sampler A/Bs at cnn4096 (nothing else on the chip) ----
for rep in g h; do
  run_bench "cnn4096_base_$rep"   -- --config cnn4096
  run_bench "cnn4096_skeyed_$rep" -- --config cnn4096 --sampler pallas_keyed
  run_bench "cnn4096_srng_$rep"   -- --config cnn4096 --sampler pallas_rng
done
say "=== CLEAN SAMPLER A/B DONE ==="

tree() {  # tree <arch> <timeout_s>
  local arch="$1" t="$2"
  say "RUN mnist32 $arch (all 4 families, d=128, 60 epochs, REAL shard, timeout ${t}s)"
  timeout "$t" python scripts/fashion_train.py \
    --dataset mnist32 --arch "$arch" --latent_dims 128 \
    --epochs 60 --n_trials 1 --eval_subprocess --scan_epochs --require_real \
    --outdir "artifacts/real_digits_${arch}_tpu" \
    >> "$LOG" 2>&1 && say "OK mnist32 $arch" || say "FAIL mnist32 $arch rc=$?"
  sleep 20
}

# ---- 3. hybrid tree only if a sweep hour survives it ----
R=$(remain)
if [ "$R" -gt 10800 ]; then
  tree hybrid $(( R - 3600 > 14400 ? 14400 : R - 3600 ))
else
  say "SKIP hybrid tree: only ${R}s left (sweep gets priority)"
fi
say "=== HYBRID TREE DONE ==="

# ---- 4. across-dims sweep with ALL remaining time ----
R=$(remain)
if [ "$R" -gt 1800 ]; then
  say "RUN across-dims sweep (timeout ${R}s, REAL shard)"
  timeout "$R" python scripts/mnist_clifpws.py \
    --d_dims 2 5 10 20 40 --n_runs 8 --epochs 60 \
    --vmap_trials --full_eval_runs 2 --eval_subprocess --require_real \
    --outdir artifacts/across_dims_mnist \
    >> "$LOG" 2>&1 && say "OK across-dims" || say "FAIL/TIMEOUT across-dims rc=$?"
else
  say "SKIP across-dims: only ${R}s of budget left"
fi

say "=== CHAIN 1F DONE ==="
