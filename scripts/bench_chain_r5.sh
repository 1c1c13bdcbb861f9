#!/bin/bash
# Round-5 TPU chain: settle the pallas_rng fused-sampler verdict.
#
# Round 4 left pallas_rng at cnn4096 "promising but UNPROVEN" on two
# clean solo reps (174.5/171.1 vs base 142.3/170.5): the +23% margin
# showed up in 1 of 2 reps, below the +20% flip bar, and the working
# hypothesis (the fused kernel removes two bit-gen dispatches per step,
# so it is less exposed to tunnel RPC latency) predicts the win varies
# with tunnel health.  BASELINE.md asked for >=4 more solo reps.
#
# This chain runs STRICTLY SOLO (no other TPU or heavy CPU process):
#   1. N interleaved (base, pallas_rng) pairs at cnn4096
#   2. one default flagship32 bench (same program the driver's
#      round-end `python bench.py` compiles — warms the persistent
#      compile cache so the driver bench is fast and clean)
#
# Launch: DEADLINE_EPOCH=<unix s> bash scripts/bench_chain_r5.sh
set -u
cd /root/repo
export CLIFFORDTPU_DATA_DIR=/root/repo/tests/data
OUT=artifacts/bench_r5
mkdir -p "$OUT"
LOG="$OUT/chain.log"
RUNS="$OUT/runs.jsonl"
DEADLINE_EPOCH=${DEADLINE_EPOCH:?set DEADLINE_EPOCH (unix s) to free the TPU before round end}

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }
remain() { echo $(( DEADLINE_EPOCH - $(date +%s) )); }

run_bench() {  # run_bench <tag> [env k=v ...] -- <bench args...>
  local tag="$1"; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  local R=$(remain)
  if [ "$R" -lt 120 ]; then say "SKIP $tag: ${R}s left"; return 1; fi
  say "RUN $tag: env=${envs[*]:-} args=$*"
  local t0=$(date +%s)
  local out
  out=$(env ${envs[@]+"${envs[@]}"} timeout $(( R < 1500 ? R : 1500 )) \
        python bench.py --skip-baseline "$@" 2>>"$LOG")
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

say "=== chain r5 start (deadline $(date -u -d @"$DEADLINE_EPOCH" +%H:%M:%S)Z) ==="

# ---- 1. warm the driver's round-end bench program FIRST (this is the
#         exact flagship32 train step `python bench.py` compiles; a warm
#         persistent cache keeps the driver's round-end bench short) ----
run_bench "flagship32_default" --

# ---- 2. interleaved solo (base, pallas_rng) pairs at cnn4096 ----
for rep in i j k l; do
  [ "$(remain)" -lt 300 ] && break
  run_bench "cnn4096_base_$rep" -- --config cnn4096
  run_bench "cnn4096_srng_$rep" -- --config cnn4096 --sampler pallas_rng
done
say "=== SAMPLER REPS DONE ==="

say "=== CHAIN R5 DONE ($(remain)s before deadline) ==="
