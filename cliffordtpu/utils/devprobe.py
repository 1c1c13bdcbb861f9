"""Deadline-guarded live-device probe.

``jax.devices()`` under the axon sitecustomize can HANG in backend init
(not raise) when the TPU tunnel is unreachable — observed live: >9 min
with no output.  Every entry point that must not depend on TPU health
(the driver's multichip dryrun gate in ``__graft_entry__``, bench's
fail-fast path) probes through here: the call runs in a daemon thread
with a deadline, and an unanswered probe is reported instead of hanging
the process.
"""

from __future__ import annotations

import threading


def probe_live_devices(timeout_s: float):
    """Return ``(device_count, None)`` on success, else ``(None, error)``.

    ``error`` distinguishes an init that raised (e.g. UNAVAILABLE from a
    wedged tunnel session) from one that never answered.
    """
    res: list = []

    def p():
        try:
            import jax

            res.append(len(jax.devices()))
        except Exception as e:
            res.append(f"backend init failed: {type(e).__name__}: {e}")

    t = threading.Thread(target=p, daemon=True)
    t.start()
    t.join(timeout_s)
    if not res:
        return None, "backend init timed out (tunnel unreachable?)"
    r = res[0]
    return (r, None) if isinstance(r, int) else (None, r)
