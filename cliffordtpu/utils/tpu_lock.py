"""Exclusive single-process TPU lock (kernel-enforced, self-releasing).

The axon TPU backend serves exactly ONE client process: when a second
process initializes the backend, the first session is revoked and its
in-flight RPCs fail with ``UNIMPLEMENTED``.  Worse for benchmarking,
two processes that *both* survive contend for the chip and silently
contaminate paired-A/B timings — this happened twice in round 4 (a
stale supervisor raced a live one onto the chip for 2.7 h; see
ROADMAP.md round-4 sessions 5/6).  The CUDA reference never needs this
— the driver time-slices clients — so this is a TPU-native runtime
subsystem, not a port of anything in ``/root/reference``.

Design: an ``fcntl.flock`` on a well-known path.  flock is a kernel
mutex keyed to the open file description, so

  * it auto-releases when the holder exits or is SIGKILLed — no stale
    lockfile cleanup, ever;
  * conflicting acquisitions fail/block even within one process (two
    ``open()`` calls create two file descriptions);
  * the lock file's *contents* (holder pid / argv / start time) are
    pure diagnostics — correctness never depends on them.

Modes (``CLIFFORDTPU_TPU_LOCK``):
  * ``wait``  — block until the chip frees up (default: a queued train
    stage is strictly better than a contaminated one; external
    ``timeout`` wrappers still bound the wait);
  * ``abort`` — raise :class:`TpuLockError` immediately, naming the
    holder (right where silently queueing would deadlock a pipeline);
  * ``off``   — no locking (escape hatch; also the implicit behavior
    for CPU-pinned processes, which never touch the chip).
"""

from __future__ import annotations

import errno
import fcntl
import json
import os
import sys
import time
from typing import Optional

DEFAULT_LOCK_PATH = "/tmp/cliffordtpu_tpu.lock"


class TpuLockError(RuntimeError):
    """The TPU lock is held by another process (mode=abort or timeout)."""


class TpuLock:
    """A held lock.  Keep a reference for the process's TPU lifetime;
    :meth:`release` (or process exit) frees it."""

    def __init__(self, fd: int, path: str):
        self._fd = fd
        self.path = path

    def release(self) -> None:
        if self._fd is not None:
            try:
                os.close(self._fd)  # closing the description drops the flock
            finally:
                self._fd = None

    @property
    def held(self) -> bool:
        return self._fd is not None

    def __enter__(self) -> "TpuLock":
        return self

    def __exit__(self, *exc) -> None:
        self.release()


def _read_holder(path: str) -> str:
    # Diagnostics only (never correctness): the holder writes its info
    # into the SAME fd that carries the flock (ftruncate+write), so a
    # lock-free reader can catch the file mid-truncate.  A temp-file
    # rename on the write side would be atomic but would swap the lock
    # inode out from under the flock, so the fix lives here: retry once
    # after the truncate+write window instead.
    for attempt in range(2):
        try:
            with open(path, "r") as f:
                raw = f.read()
            if raw.strip():
                info = json.loads(raw)
                age = time.time() - info.get("t", time.time())
                return (f"pid {info.get('pid', '?')} "
                        f"({info.get('label', '?')}, held {age:.0f}s)")
        except Exception:
            pass
        if attempt == 0:
            time.sleep(0.05)
    return "unknown holder"


def acquire_tpu_lock(path: str = None, mode: str = "wait",
                     label: str = "", poll_s: float = 5.0,
                     timeout_s: Optional[float] = None) -> TpuLock:
    """Acquire the exclusive TPU mutex (no platform check — see
    :func:`hold_tpu_lock` for the env-aware entry point).

    Raises :class:`TpuLockError` in mode="abort" when held, or in
    mode="wait" when ``timeout_s`` elapses.
    """
    path = path or os.environ.get("CLIFFORDTPU_TPU_LOCK_PATH",
                                  DEFAULT_LOCK_PATH)
    fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o666)
    # Never leak the lock into exec'd children (the CPU-pinned eval
    # subprocesses must not pin the chip after the trainer dies).
    fcntl.fcntl(fd, fcntl.F_SETFD, fcntl.FD_CLOEXEC)
    deadline = None if timeout_s is None else time.monotonic() + timeout_s
    announced = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError as e:
            if e.errno not in (errno.EAGAIN, errno.EACCES):
                os.close(fd)
                raise
            holder = _read_holder(path)
            if mode == "abort":
                os.close(fd)
                raise TpuLockError(
                    f"TPU lock {path} is held by {holder}; the axon "
                    f"backend serves one process at a time "
                    f"(CLIFFORDTPU_TPU_LOCK=wait to queue instead)")
            if deadline is not None and time.monotonic() >= deadline:
                os.close(fd)
                raise TpuLockError(
                    f"TPU lock {path} still held by {holder} after "
                    f"{timeout_s:.0f}s")
            if not announced:
                print(f"[tpu_lock] waiting for {path} (held by {holder})",
                      file=sys.stderr, flush=True)
                announced = True
            time.sleep(poll_s)
    os.ftruncate(fd, 0)
    os.write(fd, json.dumps({
        "pid": os.getpid(),
        "label": label or " ".join(sys.argv[:3]),
        "t": time.time(),
    }).encode())
    if announced:
        print(f"[tpu_lock] acquired {path}", file=sys.stderr, flush=True)
    return TpuLock(fd, path)


def _tpu_platform_requested() -> bool:
    """True when this process will initialize a non-CPU jax backend.

    Trusts ONLY the applied ``jax.config.jax_platforms`` — never the raw
    ``JAX_PLATFORMS`` env var.  Verified on this host: the axon
    sitecustomize PREPENDS its platform to the config at import
    (``JAX_PLATFORMS=cpu`` in the env yields config ``"axon,cpu"`` and a
    TPU backend), so an env-only check would classify a chip-bound
    process as CPU and skip the lock — the exact revocation class the
    lock exists to prevent.  Processes that really pin CPU do it via
    ``jax.config.update("jax_platforms", "cpu")`` (all runners/eval
    subprocesses do, per CLAUDE.md), which this check sees.  An
    empty/unset config means the platform is resolved at backend init —
    TPU on this host — so lock conservatively.
    """
    try:
        import jax

        plat = jax.config.jax_platforms or ""
    except Exception:
        return True  # no jax info -> lock conservatively (cheap, correct)
    if not plat:
        return True
    return plat.split(",")[0].strip().lower() != "cpu"


def hold_tpu_lock(label: str = "",
                  timeout_s: Optional[float] = None) -> Optional[TpuLock]:
    """Env-aware lock for entry points: no-op on CPU-pinned processes or
    under ``CLIFFORDTPU_TPU_LOCK=off``; otherwise acquires (mode from the
    env, default ``wait``) and returns the held lock."""
    mode = os.environ.get("CLIFFORDTPU_TPU_LOCK", "wait").strip().lower()
    if mode not in ("wait", "abort", "off"):
        raise ValueError(f"CLIFFORDTPU_TPU_LOCK={mode!r}: "
                         f"expected wait|abort|off")
    if mode == "off" or not _tpu_platform_requested():
        return None
    return acquire_tpu_lock(mode=mode, label=label, timeout_s=timeout_s)
