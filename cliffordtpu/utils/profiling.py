"""Profiling and debugging helpers (SURVEY.md §5 aux subsystems).

The reference only records wall-clock (``mnist_clifpws.py:700-705``); here we
add the TPU-native tooling on top of the same timing-JSON schema:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard/Perfetto trace of the enclosed steps,
* ``enable_debug_checks()`` — jax_debug_nans / jax_debug_infs toggles (the
  analogue of the reference's unused ``torch.use_deterministic_algorithms``
  hook, ``utils/__init__.py:46-56``),
* ``nan_guard`` — raises on non-finite loss so the caller restores the last
  good checkpoint (the runners' best-params tracking already never selects a
  non-finite epoch, ``fashion_train.py:868`` semantics).
"""

from __future__ import annotations

import contextlib

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_checks(nans: bool = True, infs: bool = False):
    jax.config.update("jax_debug_nans", nans)
    if infs:
        jax.config.update("jax_debug_infs", True)


class NaNLossError(RuntimeError):
    pass


def nan_guard(loss_value, context: str = ""):
    """Raise NaNLossError on non-finite loss (caller restores checkpoint)."""
    v = float(loss_value)
    if not np.isfinite(v):
        raise NaNLossError(f"non-finite loss {v} {context}")
    return v
