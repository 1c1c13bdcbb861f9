#!/bin/bash
# Round-4 stage 2b/3 supervisor.  Replaces the tail of
# scripts/realdata_chain_r4.sh + scripts/bench_chain_r4c.sh after a
# mid-round re-plan: the across-dims sweep is open-ended (4-10 h), so
# running it BEFORE the bounded chain-1c measurements would have blown
# chain 1c's 8 h gate and lost the sampler A/Bs + eval-battery TPU
# timing (VERDICT r3 items 4/5/7).  New order, strictly one TPU process
# at a time:
#   1. wait for the in-flight vit real-data stage (holds the TPU) to exit
#   2. bounded measurements: fixed fused-sampler A/Bs at cnn4096 +
#      eval-battery TPU timing on the complex-free rdft backend
#   3. hybrid real-data tree (VERDICT r3 #2, bounded ~3 h)
#   4. across-dims MLP sweep (VERDICT r3 #3) with ALL remaining time up
#      to a hard deadline that frees the TPU ~1 h before round end for
#      the driver's bench.py run.  The sweep's merge-on-write artifacts
#      (scripts/mnist_clifpws.py per-dim persist) make a timeout safe:
#      completed dims survive.
#
# Launch: VIT_PID=<pid> DEADLINE_EPOCH=<epoch s> nohup setsid bash scripts/bench_chain_r4d.sh
set -u
cd /root/repo
OUT=artifacts/bench_r4
LOG="$OUT/chain_d.log"
RUNS="$OUT/runs.jsonl"
say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

VIT_PID=${VIT_PID:?set VIT_PID to the in-flight vit stage timeout pid}
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix s) to free the TPU before round end}

say "=== chain 1d supervisor start (vit pid $VIT_PID, deadline $(date -u -d @"$DEADLINE_EPOCH" +%H:%M:%S)Z) ==="

# ---- 1. wait for the vit stage to release the TPU ----
while kill -0 "$VIT_PID" 2>/dev/null; do sleep 60; done
say "vit stage exited; vit tree complete (artifacts/real_digits_vit_tpu)"
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

# ---- 2a. sampler A/B at cnn4096 with the FIXED kernels, interleaved ----
for rep in e f; do
  run_bench "cnn4096_base_$rep"   -- --config cnn4096
  run_bench "cnn4096_skeyed_$rep" -- --config cnn4096 --sampler pallas_keyed
  run_bench "cnn4096_srng_$rep"   -- --config cnn4096 --sampler pallas_rng
done

# ---- 2b. eval battery on TPU: complex-free rdft default ----
for rep in 1 2; do
  say "RUN eval_battery tpu rdft (try $rep)"
  if timeout 2400 python scripts/eval_battery_timing.py --backend tpu \
      > "$OUT/eval_battery_tpu.json" 2>>"$LOG"; then
    say "OK eval_battery tpu rdft: $(cat "$OUT/eval_battery_tpu.json")"
    break
  else
    say "FAIL eval_battery tpu rdft rc=$? (try $rep)"
  fi
done

# ---- 2c. one complex-FFT attempt for the record (expected axon flake) ----
say "RUN eval_battery tpu fft (single attempt, flake-tolerant)"
if CLIFFORDTPU_VSA_FFT=fft timeout 2400 python scripts/eval_battery_timing.py \
    --backend tpu > "$OUT/eval_battery_tpu_fft.json" 2>>"$LOG"; then
  say "OK eval_battery tpu fft: $(cat "$OUT/eval_battery_tpu_fft.json")"
else
  say "FAIL eval_battery tpu fft rc=$? (complex-op flake class)"
fi
say "=== MEASUREMENTS DONE ==="

# ---- 3. hybrid real-data tree ----
say "RUN mnist32 hybrid (all 4 families, d=128, 60 epochs)"
timeout 14400 python scripts/fashion_train.py \
  --dataset mnist32 --arch hybrid --latent_dims 128 \
  --epochs 60 --n_trials 1 --eval_subprocess --scan_epochs \
  --outdir artifacts/real_digits_hybrid_tpu \
  >> "$LOG" 2>&1 && say "OK mnist32 hybrid" || say "FAIL mnist32 hybrid rc=$?"
say "=== HYBRID TREE DONE ==="

# ---- 4. across-dims sweep with ALL remaining time ----
REMAIN=$(( DEADLINE_EPOCH - $(date +%s) ))
if [ "$REMAIN" -gt 3600 ]; then
  say "RUN across-dims sweep (timeout ${REMAIN}s)"
  timeout "$REMAIN" python scripts/mnist_clifpws.py \
    --d_dims 2 5 10 20 40 --n_runs 8 --epochs 60 \
    --vmap_trials --full_eval_runs 2 --eval_subprocess \
    --outdir artifacts/across_dims_mnist \
    >> "$LOG" 2>&1 && say "OK across-dims" || say "FAIL/TIMEOUT across-dims rc=$?"
else
  say "SKIP across-dims: only ${REMAIN}s of budget left"
fi

say "=== CHAIN 1D DONE ==="
