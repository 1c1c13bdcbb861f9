"""Time the vmapped VSA eval battery on a chosen backend (VERDICT r3 #7).

SURVEY §7 step 4 claims the vmapped battery is "where TPU gives a large
eval speedup", but the runners pin the battery to CPU whenever training
ran on TPU (``_eval_context()``; axon per-op UNIMPLEMENTED flakes + the
reference's own CPU pinning, ``utils/vsa.py:266-267``) — so the claim
had never been measured.  This script runs the two hot battery pieces
(``test_bundle_capacity`` + ``test_binding_unbinding_pairs``, the
vmapped capacity sweeps that dominate eval wall-clock) at the
reference-scale config on ONE backend and prints a JSON line.

RUN STRICTLY SOLO when --backend tpu (one TPU process at a time).

    python scripts/eval_battery_timing.py --backend cpu
    python scripts/eval_battery_timing.py --backend tpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", choices=["cpu", "tpu"], default="cpu")
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--n_items", type=int, default=1000)
    p.add_argument("--n_trials", type=int, default=20)
    p.add_argument("--repeat", type=int, default=2,
                   help="repeats after the timed cold pass (captures the "
                        "compile-cache-warm cost)")
    args = p.parse_args()

    if args.backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        # one TPU client process at a time (ROADMAP round-4 s5/s6)
        from cliffordtpu.utils.tpu_lock import hold_tpu_lock

        _tpu_lock = hold_tpu_lock(label="eval_battery_timing")

    from cliffordtpu.vsa.capacity import (
        test_binding_unbinding_pairs,
        test_bundle_capacity,
    )

    assert jax.default_backend() == args.backend, jax.default_backend()

    def run_once(key_seed):
        t0 = time.time()
        test_bundle_capacity(d=args.d, n_items=args.n_items,
                             n_trials=args.n_trials,
                             key=jax.random.PRNGKey(key_seed))
        t1 = time.time()
        test_binding_unbinding_pairs(d=args.d, n_items=args.n_items,
                                     n_trials=args.n_trials,
                                     key=jax.random.PRNGKey(key_seed + 1))
        t2 = time.time()
        return t1 - t0, t2 - t1

    cold_bundle, cold_rf = run_once(0)
    warm = [run_once(i + 1) for i in range(args.repeat)]
    warm_bundle = min(w[0] for w in warm)
    warm_rf = min(w[1] for w in warm)
    print(json.dumps({
        "backend": args.backend,
        "device": str(jax.devices()[0]),
        "d": args.d, "n_items": args.n_items, "n_trials": args.n_trials,
        "bundle_capacity_cold_s": round(cold_bundle, 3),
        "bundle_capacity_warm_s": round(warm_bundle, 3),
        "role_filler_cold_s": round(cold_rf, 3),
        "role_filler_warm_s": round(warm_rf, 3),
        "battery_cold_s": round(cold_bundle + cold_rf, 3),
        "battery_warm_s": round(warm_bundle + warm_rf, 3),
    }))


if __name__ == "__main__":
    main()
