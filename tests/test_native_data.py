"""Native data engine (cliffordtpu/native/dataio.cc via data/native.py).

The contract under test: the C++ engine changes WHERE the host input
pipeline runs (worker-thread prefetch, native idx parse), never WHAT it
produces — every byte must match the pure-Python path.
"""

import gzip
import os
import struct

import jax
import numpy as np
import pytest

from cliffordtpu.data import native
from cliffordtpu.data.loaders import _read_idx, iterate_batches

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason="native data engine unavailable (no toolchain)")


def _write_idx(path, arr: np.ndarray, gz=False):
    payload = struct.pack(">HBB", 0, 8, arr.ndim)
    payload += struct.pack(">" + "I" * arr.ndim, *arr.shape)
    payload += arr.astype(np.uint8).tobytes()
    if gz:
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


@pytest.mark.parametrize("gz", [False, True])
def test_read_idx_matches_python(tmp_path, gz):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (7, 9, 4), np.uint8)
    p = str(tmp_path / ("a.idx" + (".gz" if gz else "")))
    _write_idx(p, arr, gz=gz)
    got = native.read_idx(p)
    np.testing.assert_array_equal(got, arr)
    # and the loaders entry point (which routes to native) agrees
    np.testing.assert_array_equal(_read_idx(p), arr)


def test_read_idx_1d_labels(tmp_path):
    arr = np.arange(10, dtype=np.uint8)
    p = str(tmp_path / "labels.idx")
    _write_idx(p, arr)
    np.testing.assert_array_equal(native.read_idx(p), arr)


@pytest.mark.parametrize("corrupt", ["magic", "short"])
def test_read_idx_corrupt_raises(tmp_path, corrupt):
    p = str(tmp_path / "bad.idx")
    if corrupt == "magic":
        with open(p, "wb") as f:
            f.write(b"\x01\x02\x03\x04garbage")
    else:  # payload shorter than the header promises
        payload = struct.pack(">HBB", 0, 8, 2) + struct.pack(">II", 100, 100)
        with open(p, "wb") as f:
            f.write(payload + b"\x00" * 10)
    with pytest.raises(ValueError, match="corrupt or non-idx"):
        native.read_idx(p)
    with pytest.raises(ValueError, match="corrupt or non-idx"):
        _read_idx(p)


def _python_batches(x, y, bs, key, drop):
    n = x.shape[0]
    idx = np.arange(n)
    if key is not None:
        idx = np.asarray(jax.random.permutation(key, n))
    end = (n // bs) * bs if drop else n
    return [(x[idx[s:s + bs]], y[idx[s:s + bs]])
            for s in range(0, end, bs)]


@pytest.mark.parametrize("keyed,drop,n,bs", [
    (True, False, 103, 16),   # shuffled, ragged tail batch
    (True, True, 103, 16),    # shuffled, drop_remainder
    (False, False, 64, 16),   # sequential, exact multiple
    (True, False, 7, 16),     # single short batch
])
def test_batch_stream_bit_identical(keyed, drop, n, bs):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(n, 5, 3, 2)).astype(np.float32)
    y = rng.integers(0, 10, n).astype(np.int64)
    key = jax.random.PRNGKey(42) if keyed else None
    want = _python_batches(x, y, bs, key, drop)
    with native.NativeBatchIterator(x, y, bs, key=key,
                                    drop_remainder=drop) as it:
        got = list(it)
    assert len(got) == len(want)
    for (gx, gy), (wx, wy) in zip(got, want):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)


def test_iterate_batches_routes_native_and_python_agree(monkeypatch):
    """The public iterator yields the same stream on both engines."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(50, 4, 4, 1)).astype(np.float32)
    y = rng.integers(0, 10, 50).astype(np.int64)
    key = jax.random.PRNGKey(7)
    # force the batcher: on 1-core hosts prefetch defaults off
    monkeypatch.setenv("CLIFFORDTPU_DATA_ENGINE", "native")
    assert native.prefetch_enabled()
    native_stream = list(iterate_batches(x, y, 8, key=key))
    monkeypatch.setenv("CLIFFORDTPU_DATA_ENGINE", "python")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    python_stream = list(iterate_batches(x, y, 8, key=key))
    monkeypatch.setattr(native, "_lib_tried", False)  # let later tests reload
    assert len(native_stream) == len(python_stream) == 7
    for (gx, gy), (wx, wy) in zip(native_stream, python_stream):
        np.testing.assert_array_equal(gx, wx)
        np.testing.assert_array_equal(gy, wy)


def test_prefetch_policy(monkeypatch):
    """Batcher routing: forced by =native, killed by =python, and by
    default tied to having a spare core for the worker thread."""
    monkeypatch.setenv("CLIFFORDTPU_DATA_ENGINE", "native")
    assert native.prefetch_enabled()
    monkeypatch.setenv("CLIFFORDTPU_DATA_ENGINE", "python")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_tried", False)
    assert not native.prefetch_enabled()
    monkeypatch.setattr(native, "_lib_tried", False)
    monkeypatch.delenv("CLIFFORDTPU_DATA_ENGINE")
    monkeypatch.setattr(os, "cpu_count", lambda: 1)
    assert not native.prefetch_enabled()
    monkeypatch.setattr(os, "cpu_count", lambda: 8)
    assert native.prefetch_enabled()


def test_iterator_close_is_idempotent_and_early():
    x = np.zeros((40, 3), np.float32)
    y = np.zeros((40,), np.int64)
    it = native.NativeBatchIterator(x, y, 8, prefetch=3)
    gen = iter(it)
    next(gen)  # consume one, leave the worker mid-epoch
    it.close()
    it.close()
    assert list(gen) == []  # closed iterator terminates cleanly


def test_multiple_epochs_fresh_iterators():
    """Per-epoch construction (the runner pattern) with distinct keys."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(33, 2)).astype(np.float32)
    y = rng.integers(0, 10, 33).astype(np.int64)
    seen = []
    for epoch in range(3):
        key = jax.random.fold_in(jax.random.PRNGKey(0), epoch)
        with native.NativeBatchIterator(x, y, 8, key=key) as it:
            seen.append(np.concatenate([b[1] for b in it]))
    # every epoch is a permutation of the labels, and epochs differ
    for s in seen:
        assert sorted(s.tolist()) == sorted(y.tolist())
    assert not np.array_equal(seen[0], seen[1])


def test_non_float32_inputs_stay_on_python_path():
    """uint8 x must NOT be routed through the native engine (which is
    float32-only) — the public iterator must yield the original dtype."""
    x = np.arange(160, dtype=np.uint8).reshape(20, 8)
    y = np.zeros((20,), np.int64)
    out = list(iterate_batches(x, y, 6))
    assert out[0][0].dtype == np.uint8
    assert sum(b[0].shape[0] for b in out) == 20
