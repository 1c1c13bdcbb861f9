"""cliffordtpu — a TPU-native JAX framework for Clifford-torus / hyperspherical VAEs.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch codebase (momalekabid/clifford-vae): reparameterized latent
distributions on spheres and tori, MLP/CNN/ViT VAE model families, a Fourier
HRR/VSA evaluation suite, and experiment runners — designed TPU-first:

- all distribution sampling is rejection-free (or fixed-budget) and jittable,
- the Clifford-torus Hermitian-FFT embedding is an exact real DFT expressed as
  MXU matmuls (with an FFT fallback for very large dims),
- training steps are pure functions compiled with ``jax.jit`` over a
  ``jax.sharding.Mesh`` (data / model axes) so the same code runs 1-chip or
  multi-chip over ICI,
- hot paths have optional fused Pallas kernels (see ``cliffordtpu.kernels``),
- trained models export to self-contained StableHLO serving bundles with a
  symbolic batch dimension (see ``cliffordtpu.serving``).
"""

__version__ = "0.1.0"

from cliffordtpu import distributions, ops, vsa

__all__ = ["distributions", "ops", "vsa", "__version__"]
