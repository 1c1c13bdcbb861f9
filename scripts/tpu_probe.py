#!/usr/bin/env python
"""Lock-respecting TPU tunnel probe for chain scripts.

``python -c "import jax; jax.devices()"`` initializes the axon backend
LOCK-FREE and can revoke a live training session — the incident class
the flock in ``cliffordtpu/utils/tpu_lock.py`` exists to prevent (the
round-4 code reviewer reproduced exactly this with an ad-hoc probe
while a trainer was on the chip).  Chain/supervisor scripts must probe
through this script instead:

    python scripts/tpu_probe.py && echo tunnel OK

It waits for the TPU lock (bounded), runs the deadline-guarded device
probe (``cliffordtpu/utils/devprobe.py`` — a dead tunnel HANGS backend
init rather than raising), prints the device count on stdout, and exits
0 on success / 1 on probe failure / 2 on lock timeout.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--lock_timeout", type=float, default=600.0,
                   help="max seconds to wait for the TPU lock")
    p.add_argument("--probe_timeout", type=float, default=240.0,
                   help="deadline for backend init + device enumeration")
    a = p.parse_args()

    from cliffordtpu.utils.tpu_lock import TpuLockError, acquire_tpu_lock

    try:
        lock = acquire_tpu_lock(mode="wait", label="tpu_probe",
                                timeout_s=a.lock_timeout)
    except TpuLockError as e:
        print(f"tpu_probe: {e}", file=sys.stderr)
        return 2
    try:
        from cliffordtpu.utils.devprobe import probe_live_devices

        count, err = probe_live_devices(a.probe_timeout)
        if err is None:
            print(count)
            return 0
        print(f"tpu_probe: {err}", file=sys.stderr)
        return 1
    finally:
        lock.release()


if __name__ == "__main__":
    sys.exit(main())
