"""The single-process TPU mutex (``cliffordtpu/utils/tpu_lock.py``).

The axon backend serves one client process; round 4 twice saw a second
trainer land on the chip and contaminate paired-A/B timings (ROADMAP
round-4 sessions 5/6).  These tests cover pure flock semantics — no jax
device use — so they run anywhere, fast.
"""

import json
import os
import subprocess
import sys
import threading
import time

import pytest

from cliffordtpu.utils.tpu_lock import (
    TpuLockError,
    acquire_tpu_lock,
    hold_tpu_lock,
)


def test_acquire_writes_holder_and_releases(tmp_path):
    p = str(tmp_path / "lock")
    lk = acquire_tpu_lock(path=p, mode="abort", label="t1")
    assert lk.held
    info = json.loads(open(p).read())
    assert info["pid"] == os.getpid()
    assert info["label"] == "t1"
    lk.release()
    assert not lk.held
    with acquire_tpu_lock(path=p, mode="abort") as lk2:  # re-acquirable
        assert lk2.held


def test_second_acquire_aborts_naming_holder(tmp_path):
    p = str(tmp_path / "lock")
    lk = acquire_tpu_lock(path=p, mode="abort", label="holderproc")
    try:
        # flock conflicts across open-file-descriptions even within one
        # process, so this exercises the real contention path
        with pytest.raises(TpuLockError, match="holderproc"):
            acquire_tpu_lock(path=p, mode="abort")
    finally:
        lk.release()


def test_wait_mode_blocks_until_release(tmp_path):
    p = str(tmp_path / "lock")
    lk = acquire_tpu_lock(path=p, mode="abort")
    t = threading.Timer(0.4, lk.release)
    t.start()
    t0 = time.monotonic()
    lk2 = acquire_tpu_lock(path=p, mode="wait", poll_s=0.05)
    assert time.monotonic() - t0 >= 0.3
    lk2.release()
    t.join()


def test_wait_timeout_raises(tmp_path):
    p = str(tmp_path / "lock")
    lk = acquire_tpu_lock(path=p, mode="abort")
    try:
        with pytest.raises(TpuLockError, match="still held"):
            acquire_tpu_lock(path=p, mode="wait", poll_s=0.05,
                             timeout_s=0.25)
    finally:
        lk.release()


def test_lock_freed_when_holder_dies(tmp_path):
    """SIGKILLed holder frees the lock with no cleanup — the property a
    lockfile-with-pid scheme does NOT have."""
    p = str(tmp_path / "lock")
    mod = os.path.join(os.path.dirname(__file__), os.pardir,
                       "cliffordtpu", "utils", "tpu_lock.py")
    # load the module by file path: the child must not pay the
    # cliffordtpu package (and jax) import just to flock
    code = (
        "import importlib.util, sys, time\n"
        "spec = importlib.util.spec_from_file_location('tl', sys.argv[1])\n"
        "tl = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(tl)\n"
        "lk = tl.acquire_tpu_lock(path=sys.argv[2], mode='abort')\n"
        "print('HELD', flush=True)\n"
        "time.sleep(60)\n"
    )
    proc = subprocess.Popen([sys.executable, "-c", code, mod, p],
                            stdout=subprocess.PIPE, text=True)
    try:
        assert proc.stdout.readline().strip() == "HELD"
        with pytest.raises(TpuLockError):
            acquire_tpu_lock(path=p, mode="abort")
    finally:
        proc.kill()
        proc.wait()
    deadline = time.monotonic() + 5.0
    while True:  # kernel frees the flock when the holder dies
        try:
            acquire_tpu_lock(path=p, mode="abort").release()
            break
        except TpuLockError:
            assert time.monotonic() < deadline, "lock not freed by death"
            time.sleep(0.05)


def test_hold_skips_on_cpu_platform(tmp_path, monkeypatch):
    # the suite conftest pins jax_platforms=cpu, so the env-aware entry
    # point must refuse to lock (CPU processes never touch the chip)
    monkeypatch.setenv("CLIFFORDTPU_TPU_LOCK_PATH", str(tmp_path / "lock"))
    assert hold_tpu_lock(label="x") is None
    assert not (tmp_path / "lock").exists()


def test_hold_off_mode(monkeypatch):
    monkeypatch.setenv("CLIFFORDTPU_TPU_LOCK", "off")
    assert hold_tpu_lock() is None


def test_hold_rejects_bad_mode(monkeypatch):
    # validated BEFORE the platform short-circuit: a typo'd env var must
    # fail loudly even in a CPU-pinned process
    monkeypatch.setenv("CLIFFORDTPU_TPU_LOCK", "nonsense")
    with pytest.raises(ValueError, match="nonsense"):
        hold_tpu_lock()


def test_tpu_probe_locks_before_probing(tmp_path, monkeypatch):
    """scripts/tpu_probe.py must hold the TPU lock BEFORE initializing
    the backend, and report rc=2 without probing when the lock is held.
    (No subprocess: a fresh interpreter on this host would reach the
    real axon backend through sitecustomize.)"""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tpu_probe", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "scripts", "tpu_probe.py"))
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)

    lock_path = str(tmp_path / "lock")
    monkeypatch.setenv("CLIFFORDTPU_TPU_LOCK_PATH", lock_path)

    calls = []

    def fake_probe(timeout_s):
        # the lock must already be held by the probe at this point
        with pytest.raises(TpuLockError):
            acquire_tpu_lock(path=lock_path, mode="abort")
        calls.append(timeout_s)
        return 1, None

    import cliffordtpu.utils.devprobe as devprobe
    monkeypatch.setattr(devprobe, "probe_live_devices", fake_probe)

    monkeypatch.setattr(sys, "argv", ["tpu_probe.py", "--probe_timeout", "7"])
    assert probe.main() == 0
    assert calls == [7.0]

    # held lock -> rc=2, probe never runs, and the holder's lock survives
    holder = acquire_tpu_lock(path=lock_path, mode="abort", label="holder")
    try:
        monkeypatch.setattr(sys, "argv",
                            ["tpu_probe.py", "--lock_timeout", "0.2"])
        assert probe.main() == 2
        assert calls == [7.0]
    finally:
        holder.release()
