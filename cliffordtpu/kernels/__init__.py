"""Optional fused Pallas TPU kernels for the hot ops.

Parity mode is pure jnp (``cliffordtpu.ops``); these kernels are enabled
explicitly (``ops.torus`` stays the reference implementation and every
kernel is tested against it).
"""

from cliffordtpu.kernels.torus_pallas import angles_to_torus_fused

__all__ = ["angles_to_torus_fused"]
