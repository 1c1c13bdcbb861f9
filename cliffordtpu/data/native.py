"""ctypes bindings for the native data engine (`native/dataio.cc`).

The reference's host input pipeline is torch's C++ DataLoader
(`/root/reference/cnn/fashion_train.py:703-760`); this module is the
framework's native equivalent: idx parsing and a worker-thread batch
assembler in C++, staged ahead of consumption so host-side batch
gather overlaps device compute.

Determinism contract: the shuffle permutation is computed by the
CALLER with `jax.random.permutation` and handed to C++, so the batch
stream is bit-identical to the pure-Python `iterate_batches` path —
the native engine changes WHERE gather runs, never WHAT is gathered.

Everything degrades gracefully: no compiler, a failed build, or
`CLIFFORDTPU_DATA_ENGINE=python` all land on the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_lib = None
_lib_tried = False
_lock = threading.Lock()


def _load():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("CLIFFORDTPU_DATA_ENGINE", "").lower() == "python":
            return None
        from cliffordtpu.native.build import build

        path = build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.idx_header.restype = ctypes.c_int64
        lib.idx_header.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32)]
        lib.idx_payload.restype = ctypes.c_int32
        lib.idx_payload.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.batcher_create.restype = ctypes.c_void_p
        lib.batcher_create.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32]
        lib.batcher_next.restype = ctypes.c_int64
        lib.batcher_next.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        lib.batcher_n_batches.restype = ctypes.c_int64
        lib.batcher_n_batches.argtypes = [ctypes.c_void_p]
        lib.batcher_destroy.restype = None
        lib.batcher_destroy.argtypes = [ctypes.c_void_p]
        if lib.dataio_abi_version() != 1:
            return None
        _lib = lib
        return _lib


def available() -> bool:
    """True when the native engine built, loaded, and isn't opted out."""
    return _load() is not None


def prefetch_enabled() -> bool:
    """Whether `iterate_batches` should route through the C++ batcher.

    The worker-thread assembler only pays off when there is a spare core
    to run it on — measured on a 1-core host it LOSES to the plain numpy
    gather (269 vs 181 ms/epoch on 60k x 784, BASELINE.md) because the
    producer thread contends with the consumer and the staging ring adds
    copies.  So: on by default only with >= 2 CPUs;
    ``CLIFFORDTPU_DATA_ENGINE=native`` forces it on anywhere, ``python``
    forces everything off.  Native idx *parsing* is independent of this
    (it wins ~3x everywhere).
    """
    if not available():
        return False
    mode = os.environ.get("CLIFFORDTPU_DATA_ENGINE", "").lower()
    if mode == "native":
        return True
    return (os.cpu_count() or 1) >= 2


def read_idx(path: str) -> Optional[np.ndarray]:
    """Native idx parse (plain or .gz). None when the engine is absent;
    raises ValueError on corrupt files, matching loaders._read_idx."""
    lib = _load()
    if lib is None:
        return None
    ndim = ctypes.c_int32(0)
    dims = (ctypes.c_uint32 * 3)()
    total = lib.idx_header(path.encode(), ctypes.byref(ndim), dims)
    if total < 0:
        raise ValueError(f"corrupt or non-idx file {path!r} (native parser)")
    out = np.empty(int(total), np.uint8)
    if lib.idx_payload(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                       int(total)) != 0:
        raise ValueError(f"corrupt or non-idx file {path!r}: short payload")
    return out.reshape(tuple(int(dims[i]) for i in range(ndim.value)))


class NativeBatchIterator:
    """Prefetching minibatch iterator over prepared host arrays.

    Same stream as `loaders.iterate_batches` (identical permutation
    source), with batch gather running on a C++ worker thread `prefetch`
    batches ahead.  Use as an iterator or context manager; `close()` is
    idempotent and also runs at garbage collection.
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, batch_size: int, *,
                 key=None, drop_remainder: bool = False, prefetch: int = 2):
        lib = _load()
        if lib is None:
            raise RuntimeError("native data engine unavailable")
        n = x.shape[0]
        if key is not None:
            import jax

            perm = np.asarray(jax.random.permutation(key, n), np.int64)
        else:
            perm = np.arange(n, dtype=np.int64)
        # C-contiguous float32/int64 copies only when needed; kept as
        # attributes so the borrowed pointers outlive the C++ batcher.
        self._x = np.ascontiguousarray(x, np.float32).reshape(n, -1)
        self._y = np.ascontiguousarray(y, np.int64)
        self._perm = perm
        self._shape = x.shape[1:]
        self._batch = int(batch_size)
        self._row = int(self._x.shape[1])
        self._lib = lib
        self._handle = lib.batcher_create(
            self._x.ctypes.data_as(ctypes.c_void_p),
            self._y.ctypes.data_as(ctypes.c_void_p),
            n, self._row,
            perm.ctypes.data_as(ctypes.c_void_p),
            self._batch, int(drop_remainder), max(1, int(prefetch)))
        if not self._handle:
            raise RuntimeError("batcher_create failed")
        self.n_batches = int(lib.batcher_n_batches(self._handle))

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        # single-consumer, one-pass stream: the C++ batcher drains once.
        # The finally releases the worker (ring buffers + array copies)
        # as soon as iteration ends — including a consumer exception or
        # an abandoned generator — instead of waiting for __del__.
        xb = np.empty((self._batch, self._row), np.float32)
        yb = np.empty((self._batch,), np.int64)
        try:
            while True:
                if self._handle is None:
                    return
                got = self._lib.batcher_next(
                    self._handle,
                    xb.ctypes.data_as(ctypes.c_void_p),
                    yb.ctypes.data_as(ctypes.c_void_p))
                if got <= 0:
                    return
                g = int(got)
                yield (xb[:g].reshape((g,) + self._shape).copy(),
                       yb[:g].copy())
        finally:
            self.close()

    def close(self):
        h, self._handle = self._handle, None
        if h is not None:
            self._lib.batcher_destroy(h)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
