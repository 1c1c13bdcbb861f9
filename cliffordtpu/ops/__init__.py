"""Core tensor ops (L0): torus transforms, fused kernels."""

from cliffordtpu.ops.torus import (
    angles_to_torus,
    torus_to_angles,
    wrap_angle,
)

__all__ = ["angles_to_torus", "torus_to_angles", "wrap_angle"]
