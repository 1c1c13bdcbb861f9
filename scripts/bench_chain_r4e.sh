#!/bin/bash
# Round-4 stage 2c: REAL-DATA rerun chain + the bounded measurements.
#
# The 12:05Z realdata chain trained on the synthetic glyph fallback: it
# never set CLIFFORDTPU_DATA_DIR, and the runners chdir into --outdir so
# the relative ./data path can never resolve the committed shard.  Every
# tree it produced (cnn committed at 47628a1, the killed vit stage) was
# synthetic data mislabeled as real.  This chain reruns everything with
# the committed real-digit shard (absolute path) and --require_real so a
# recurrence aborts instead of silently training on glyphs.
#
# Order is value-density under a hard TPU deadline (strictly one TPU
# process at a time; stage N+1 starts only when stage N's process died):
#   1. cnn tree rerun (~45 min — fixes the mislabeled deliverable)
#   2. fixed fused-sampler A/Bs at cnn4096 + eval-battery TPU timing
#      (bounded; VERDICT r3 items 4/5/7)
#   3. vit tree (VERDICT r3 #2)
#   4. hybrid tree if >= 3h remain (merge-on-write keeps completed
#      families if the timeout truncates it)
#   5. across-dims MLP sweep with whatever remains (VERDICT r3 #3;
#      per-dim merge-on-write makes a timeout safe)
#
# Launch: DEADLINE_EPOCH=<unix s> nohup setsid bash scripts/bench_chain_r4e.sh
set -u
cd /root/repo
export CLIFFORDTPU_DATA_DIR=/root/repo/tests/data
OUT=artifacts/bench_r4
LOG="$OUT/chain_e.log"
RUNS="$OUT/runs.jsonl"
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix s) to free the TPU before round end}

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
remain() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

say "=== chain 1e start (deadline $(date -u -d @"$DEADLINE_EPOCH" +%H:%M:%S)Z) ==="
timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
  || { say "tunnel dead at start; aborting"; exit 3; }

tree() {  # tree <arch> <timeout_s>
  local arch="$1" t="$2"
  say "RUN mnist32 $arch (all 4 families, d=128, 60 epochs, REAL shard, timeout ${t}s)"
  timeout "$t" python scripts/fashion_train.py \
    --dataset mnist32 --arch "$arch" --latent_dims 128 \
    --epochs 60 --n_trials 1 --eval_subprocess --scan_epochs --require_real \
    --outdir "artifacts/real_digits_${arch}_tpu" \
    >> "$LOG" 2>&1 && say "OK mnist32 $arch" || say "FAIL mnist32 $arch rc=$?"
  sleep 20  # let the axon backend release before the next process
}

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

# ---- 1. cnn tree rerun on the REAL shard ----
tree cnn 7200
say "=== CNN TREE DONE ==="

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

# ---- 3. vit tree ----
R=$(remain)
if [ "$R" -gt 5400 ]; then
  tree vit $(( R > 14400 ? 14400 : R - 1800 ))
else
  say "SKIP vit tree: only ${R}s left"
fi
say "=== VIT TREE DONE ==="

# ---- 4. hybrid tree only if a sweep hour survives it ----
R=$(remain)
if [ "$R" -gt 10800 ]; then
  tree hybrid $(( R - 3600 > 14400 ? 14400 : R - 3600 ))
else
  say "SKIP hybrid tree: only ${R}s left (sweep gets priority)"
fi
say "=== HYBRID TREE DONE ==="

# ---- 5. across-dims sweep with ALL remaining time ----
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

say "=== CHAIN 1E DONE ==="
