"""Mesh construction over ICI.

On a single host this covers real multi-chip slices and the
``xla_force_host_platform_device_count`` virtual CPU mesh alike; multi-host
callers run ``jax.distributed.initialize`` first and pass
``jax.devices()`` through unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = ("data", "model"),
    devices=None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh.

    Default shape: all devices on the data axis, model axis 1 — pure DP,
    which is the reference-parity configuration.  Pass e.g. (4, 2) for
    DP x TP over 8 chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def parse_mesh_spec(spec: str, n_devices: Optional[int] = None
                    ) -> Tuple[int, int]:
    """Parse a CLI mesh spec into a (data, model) shape.

    ``"dp"``/``"auto"`` — all local devices on the data axis (pure DP,
    the BASELINE.json north-star configuration); ``"N"`` — N-way DP;
    ``"NxM"`` — N-way DP x M-way TP.
    """
    n = n_devices if n_devices is not None else len(jax.devices())
    s = spec.strip().lower()
    if s in ("dp", "auto"):
        return (n, 1)
    if "x" in s:
        d, m = s.split("x", 1)
        return (int(d), int(m))
    return (int(s), 1)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
