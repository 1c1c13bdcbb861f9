"""Build the native components into shared libraries / executables.

No pybind11 / pip in this image, so everything is plain C ABI compiled
with the system `g++` on first use:

- ``dataio``      (.so)  host input pipeline (idx parse + batcher)
- ``pjrt_mock``   (.so)  mock PJRT plugin for contract tests
- ``pjrt_serve``  (exe)  PJRT serving host for exported bundles

Builds are cached next to a hash of the source + compiler flags; a
missing/failed toolchain is NOT an error — callers fall back to the
pure-Python paths.  The PJRT targets additionally need the
``pjrt_c_api.h`` header shipped inside the installed tensorflow package
(located without importing tensorflow); absent header -> those targets
return None.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import tempfile
from typing import Optional

_DIR = os.path.dirname(__file__)
_CACHE_DIR = os.environ.get(
    "CLIFFORDTPU_NATIVE_CACHE",
    os.path.join(tempfile.gettempdir(), "cliffordtpu_native"),
)
_CXX = os.environ.get("CXX", "g++")
_BASE_FLAGS = ["-O3", "-std=c++17", "-fPIC", "-pthread"]


def pjrt_include_dir() -> Optional[str]:
    """Directory containing xla/pjrt/c/pjrt_c_api.h, or None."""
    override = os.environ.get("CLIFFORDTPU_PJRT_INCLUDE")
    cands = [override] if override else []
    spec = importlib.util.find_spec("tensorflow")
    if spec is not None and spec.origin:
        cands.append(os.path.join(os.path.dirname(spec.origin), "include"))
    for d in cands:
        if d and os.path.exists(os.path.join(d, "xla/pjrt/c/pjrt_c_api.h")):
            return d
    return None


_TARGETS = {
    "dataio": {"src": "dataio.cc", "shared": True, "libs": ["-lz"]},
    "pjrt_mock": {"src": "pjrt_mock_plugin.cc", "shared": True, "libs": [],
                  "needs_pjrt": True},
    "pjrt_serve": {"src": "pjrt_serve.cc", "shared": False,
                   "libs": ["-lz", "-ldl"], "needs_pjrt": True},
}


def _cmd_for(target: str) -> Optional[list]:
    t = _TARGETS[target]
    src = os.path.join(_DIR, t["src"])
    flags = list(_BASE_FLAGS)
    if t["shared"]:
        flags.append("-shared")
    if t.get("needs_pjrt"):
        inc = pjrt_include_dir()
        if inc is None:
            return None
        flags.append(f"-I{inc}")
    return [_CXX, *flags, src, *t["libs"]]


def _tag(cmd: list, src: str) -> str:
    h = hashlib.sha256()
    with open(src, "rb") as f:
        h.update(f.read())
    h.update(" ".join(cmd).encode())
    return h.hexdigest()[:16]


def build(target: str = "dataio", verbose: bool = False) -> Optional[str]:
    """Return the path to the built artifact, or None if unavailable.

    Idempotent: a cache hit (same source + flags) skips the compile.
    """
    if target not in _TARGETS:
        raise ValueError(f"unknown native target {target!r}")
    t = _TARGETS[target]
    src = os.path.join(_DIR, t["src"])
    cmd = _cmd_for(target)
    if cmd is None:
        if verbose:
            print(f"[cliffordtpu.native] {target}: pjrt_c_api.h not found")
        return None
    try:
        tag = _tag(cmd, src)
    except OSError:
        return None
    ext = ".so" if t["shared"] else ""
    out = os.path.join(_CACHE_DIR, f"{target}_{tag}{ext}")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    full = cmd[:-len(t["libs"])] + ["-o", tmp] + t["libs"] if t["libs"] \
        else cmd + ["-o", tmp]
    try:
        proc = subprocess.run(full, capture_output=True, text=True,
                              timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print(f"[cliffordtpu.native] build failed: {e}")
        return None
    if proc.returncode != 0:
        if verbose:
            print(f"[cliffordtpu.native] {' '.join(full)}\n{proc.stderr}")
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    os.replace(tmp, out)  # atomic: concurrent builders race benignly
    return out


if __name__ == "__main__":
    import sys

    targets = sys.argv[1:] or list(_TARGETS)
    for tgt in targets:
        path = build(tgt, verbose=True)
        print(f"{tgt}: {path or 'BUILD FAILED'}")
