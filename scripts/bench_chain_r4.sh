#!/bin/bash
# Round-4 TPU measurement chain (VERDICT r3 items #1, #4, #5, #7, #9).
# Run STRICTLY SOLO (one TPU process at a time; quiet host — no CPU jobs).
# Every result lands in the repo (artifacts/bench_r4/), not /tmp: the
# round-4 session-2 chain wrote to /tmp and the VM was recycled.
set -u
cd /root/repo
OUT=artifacts/bench_r4
mkdir -p "$OUT"
LOG="$OUT/chain.log"
RUNS="$OUT/runs.jsonl"

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

# health probe: is the tunnel answering?
probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

# run_bench TAG [env K=V ...] -- bench args...
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
  # bench prints exactly one JSON line on stdout
  BENCH_OUT="$out" python - "$tag" $((t1-t0)) <<'PYEOF' >> "$RUNS"
import json, os, sys
line = os.environ["BENCH_OUT"].strip().splitlines()[-1]
d = json.loads(line)
d["tag"] = sys.argv[1]; d["wall_s"] = int(sys.argv[2])
print(json.dumps(d))
PYEOF
  say "OK $tag ($((t1-t0))s): $out"
}

say "=== chain start ==="
probe || { say "tunnel dead at start; aborting"; exit 3; }

# ---- stage 1: flagship32 A/B (attention, fused_proj) — interleaved ----
for rep in a b; do
  run_bench "fl32_base_$rep"  -- --config flagship32
  run_bench "fl32_attn_$rep"  -- --config flagship32 --attention pallas
  run_bench "fl32_fproj_$rep" -- --config flagship32 --fused_proj
done

# ---- stage 2: cnn4096 torus + sampler A/Bs — interleaved ----
for rep in a b; do
  run_bench "cnn4096_base_$rep"   -- --config cnn4096
  run_bench "cnn4096_matmul_$rep" CLIFFORDTPU_TORUS_METHOD=matmul -- --config cnn4096
  run_bench "cnn4096_skeyed_$rep" -- --config cnn4096 --sampler pallas_keyed
  run_bench "cnn4096_srng_$rep"   -- --config cnn4096 --sampler pallas_rng
done

# ---- stage 3: flagship256 A/B (attention) ----
for rep in a b; do
  run_bench "fl256_base_$rep" -- --config flagship256
  run_bench "fl256_attn_$rep" -- --config flagship256 --attention pallas
done

# ---- stage 4: pjrt serving smoke against the real plugin ----
say "RUN pjrt_smoke"
timeout 2400 python scripts/pjrt_serve_smoke.py --outdir "$OUT/pjrt_smoke" \
  >> "$LOG" 2>&1 && say "OK pjrt_smoke" || say "FAIL pjrt_smoke rc=$?"

# ---- stage 5: eval-battery timing, TPU then CPU ----
say "RUN eval_battery tpu"
timeout 2400 python scripts/eval_battery_timing.py --backend tpu \
  > "$OUT/eval_battery_tpu.json" 2>>"$LOG" && say "OK eval_battery tpu" \
  || say "FAIL eval_battery tpu rc=$?"
say "RUN eval_battery cpu"
timeout 2400 python scripts/eval_battery_timing.py --backend cpu \
  > "$OUT/eval_battery_cpu.json" 2>>"$LOG" && say "OK eval_battery cpu" \
  || say "FAIL eval_battery cpu rc=$?"

say "=== CHAIN DONE ==="
