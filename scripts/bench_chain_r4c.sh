#!/bin/bash
# Round-4 stage 3: the two TPU measurements still outstanding after the
# stage-1b chain — (a) the fused-sampler A/Bs at cnn4096, which ran
# BEFORE the Mosaic-lowering + VMEM fixes landed (commits 4b694ac,
# 2632949) and so failed rc=1, and (b) the eval-battery TPU timing,
# which previously died first on an axon complex-op flake and then on a
# cached-basis tracer leak — both addressed by the complex-free real-DFT
# VSA backend (cliffordtpu/vsa/rdft.py).
#
# Self-gates: waits for scripts/realdata_chain_r4.sh to log
# "REALDATA CHAIN DONE" before touching the TPU (one process at a time).
set -u
cd /root/repo
OUT=artifacts/bench_r4
LOG="$OUT/chain_c.log"
RUNS="$OUT/runs.jsonl"

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== chain 1c queued; gating on realdata chain ==="
for i in $(seq 1 480); do
  grep -q "REALDATA CHAIN DONE" "$OUT/realdata.log" 2>/dev/null && break
  sleep 60
done
grep -q "REALDATA CHAIN DONE" "$OUT/realdata.log" 2>/dev/null \
  || { say "gate timed out after 8h; aborting"; exit 4; }
say "=== chain 1c start ==="

timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1 \
  || { say "tunnel dead at start; aborting"; exit 3; }

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

# ---- sampler A/B at cnn4096 with the FIXED kernels, interleaved ----
for rep in e f; do
  run_bench "cnn4096_base_$rep"   -- --config cnn4096
  run_bench "cnn4096_skeyed_$rep" -- --config cnn4096 --sampler pallas_keyed
  run_bench "cnn4096_srng_$rep"   -- --config cnn4096 --sampler pallas_rng
done

# ---- eval battery on TPU: complex-free rdft default ----
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

# ---- one complex-FFT attempt for the record (expected axon flake) ----
say "RUN eval_battery tpu fft (single attempt, flake-tolerant)"
if CLIFFORDTPU_VSA_FFT=fft timeout 2400 python scripts/eval_battery_timing.py \
    --backend tpu > "$OUT/eval_battery_tpu_fft.json" 2>>"$LOG"; then
  say "OK eval_battery tpu fft: $(cat "$OUT/eval_battery_tpu_fft.json")"
else
  say "FAIL eval_battery tpu fft rc=$? (complex-op flake class)"
fi

say "=== CHAIN 1C DONE ==="
