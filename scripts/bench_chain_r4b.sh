#!/bin/bash
# Round-4 stage 1b: re-run the chain stages that failed in
# scripts/bench_chain_r4.sh — the fused samplers (Mosaic expm1/atan
# lowering fixed this session), the pjrt smoke (tolerance fixed), and a
# retry of the TPU eval battery (axon complex-op flake) — then hand off
# to scripts/realdata_chain_r4.sh.  Run STRICTLY SOLO.
set -u
cd /root/repo
OUT=artifacts/bench_r4
mkdir -p "$OUT"
LOG="$OUT/chain_b.log"
RUNS="$OUT/runs.jsonl"

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

probe() {
  timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
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

say "=== chain 1b start ==="
probe || { say "tunnel dead at start; aborting"; exit 3; }

# ---- sampler A/B at cnn4096, interleaved with fresh bases ----
for rep in c d; do
  run_bench "cnn4096_base_$rep"   -- --config cnn4096
  run_bench "cnn4096_skeyed_$rep" -- --config cnn4096 --sampler pallas_keyed
  run_bench "cnn4096_srng_$rep"   -- --config cnn4096 --sampler pallas_rng
done

# ---- pjrt smoke with the corrected tolerance ----
say "RUN pjrt_smoke (tol 2e-2)"
timeout 2400 python scripts/pjrt_serve_smoke.py --outdir "$OUT/pjrt_smoke" \
  >> "$LOG" 2>&1 && say "OK pjrt_smoke" || say "FAIL pjrt_smoke rc=$?"

# ---- eval battery TPU: retry (axon per-op flakes are sporadic) ----
for rep in 1 2; do
  say "RUN eval_battery tpu (try $rep)"
  if timeout 2400 python scripts/eval_battery_timing.py --backend tpu \
      > "$OUT/eval_battery_tpu.json" 2>>"$LOG"; then
    say "OK eval_battery tpu"; break
  else
    say "FAIL eval_battery tpu rc=$? (try $rep)"
  fi
done

say "=== CHAIN 1B DONE — handing off to realdata chain ==="
exec bash scripts/realdata_chain_r4.sh
