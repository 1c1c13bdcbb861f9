"""Datasets: MNIST / FashionMNIST / CIFAR-10 loaders with a synthetic fallback.

The reference pulls datasets through torchvision downloads
(``mnist/mnist_clifpws.py:188-205``, ``cnn/fashion_train.py``).  This build
environment has zero egress, so loading order is:

1. real data from ``$CLIFFORDTPU_DATA_DIR`` (or ``./data``) in either
   idx-ubyte (``train-images-idx3-ubyte[.gz]``) or ``.npz`` form,
2. a *deterministic procedural* fallback that synthesizes class-structured
   images (digit glyphs for MNIST, per-class texture motifs for
   Fashion/CIFAR).  The fallback is clearly labelled in the returned
   metadata; all correctness tests and benchmarks are shape/throughput
   faithful either way.
"""

from cliffordtpu.data.loaders import (
    binarize_with_random_threshold,
    iterate_batches,
    load_dataset,
)

__all__ = [
    "binarize_with_random_threshold",
    "iterate_batches",
    "load_dataset",
]
