"""Build the native data engine (`dataio.cc`) into a shared library.

No pybind11 / pip in this image, so the extension is a plain C ABI
`.so` compiled with the system `g++` on first use and loaded via
ctypes (`cliffordtpu/data/native.py`).  The build is cached next to a
hash of the source + compiler version; a missing/failed toolchain is
NOT an error — callers fall back to the pure-Python path.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "dataio.cc")
_CACHE_DIR = os.environ.get(
    "CLIFFORDTPU_NATIVE_CACHE",
    os.path.join(tempfile.gettempdir(), "cliffordtpu_native"),
)
_CXX = os.environ.get("CXX", "g++")
_FLAGS = ["-O3", "-std=c++17", "-shared", "-fPIC", "-pthread"]
_LIBS = ["-lz"]


def _source_tag() -> str:
    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(" ".join([_CXX] + _FLAGS + _LIBS).encode())
    return h.hexdigest()[:16]


def build(verbose: bool = False) -> str | None:
    """Return the path to the built `.so`, or None if the build fails.

    Idempotent: a cache hit (same source + flags) skips the compile.
    """
    try:
        tag = _source_tag()
    except OSError:
        return None
    out = os.path.join(_CACHE_DIR, f"dataio_{tag}.so")
    if os.path.exists(out):
        return out
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tmp = out + f".tmp{os.getpid()}"
    cmd = [_CXX, *_FLAGS, _SRC, "-o", tmp, *_LIBS]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:
        if verbose:
            print(f"[cliffordtpu.native] build failed: {e}")
        return None
    if proc.returncode != 0:
        if verbose:
            print(f"[cliffordtpu.native] {' '.join(cmd)}\n{proc.stderr}")
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None
    os.replace(tmp, out)  # atomic: concurrent builders race benignly
    return out


if __name__ == "__main__":
    path = build(verbose=True)
    print(path or "BUILD FAILED")
