#!/bin/bash
# Round-4 stage 4: settle the pallas_rng verdict with more clean reps.
#
# The chain-1f clean solo A/Bs left pallas_rng at +23%/+0.3% vs base —
# the two fastest cnn4096 numbers recorded, but 1-of-2 reps above the
# +20% flip bar is not a sustained win.  This chain runs after chain 1f
# releases the chip (supervisor exit; its sweep stage is timeout-killed
# at the TPU deadline) and collects 4 more interleaved base/srng pairs.
#
# Safe to interleave with the driver's round-end bench.py: every bench
# invocation now takes the TPU flock (utils/tpu_lock.py), so runs
# queue instead of contaminating each other; each rep holds the chip
# for only ~1-4 min.  A hard stop time bounds total interference.
#
# Launch: CHAIN_F_PID=<pid> STOP_EPOCH=<unix s> nohup setsid bash scripts/bench_chain_r4g.sh
set -u
cd /root/repo
OUT=artifacts/bench_r4
LOG="$OUT/chain_g.log"
RUNS="$OUT/runs.jsonl"
CHAIN_F_PID=${CHAIN_F_PID:?set CHAIN_F_PID to the chain-1f supervisor pid}
STOP_EPOCH=${STOP_EPOCH:?set STOP_EPOCH (unix s): no new rep starts after this}

say() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "=== chain 1g start (waits on chain-1f pid $CHAIN_F_PID, stop $(date -u -d @"$STOP_EPOCH" +%H:%M:%S)Z) ==="
while kill -0 "$CHAIN_F_PID" 2>/dev/null; do sleep 60; done
say "chain 1f exited; chip free (modulo driver bench, serialized by the flock)"
sleep 30

run_bench() {
  local tag="$1"; shift
  say "RUN $tag: args=$*"
  local t0=$(date +%s)
  local out
  out=$(timeout 2400 python bench.py --skip-baseline "$@" 2>>"$LOG")
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

for rep in i j k l; do
  if [ "$(date +%s)" -ge "$STOP_EPOCH" ]; then
    say "STOP: past stop time before rep $rep"
    break
  fi
  run_bench "cnn4096_base_$rep" -- --config cnn4096
  run_bench "cnn4096_srng_$rep" -- --config cnn4096 --sampler pallas_rng
done

say "=== CHAIN 1G DONE ==="
