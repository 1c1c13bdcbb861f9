#!/usr/bin/env python
"""Build the committed real-handwritten-digit golden shard.

This zero-egress environment has no MNIST download, so the golden
end-to-end data test uses the only REAL handwritten-digit scans available
offline: scikit-learn's bundled UCI ``load_digits`` corpus (1797 genuine
8x8 scans of handwritten digits, test set of the NIST-derived UCI
"Optical Recognition of Handwritten Digits" dataset).  The shard is
bilinearly upsampled to the 28x28 MNIST geometry so the whole MNIST
ingestion + runner path (``cliffordtpu/data/loaders.py``,
``scripts/mnist_clifpws.py``) runs end-to-end on non-synthetic data.

Writes ``tests/data/mnist/mnist.npz`` — the FULL 1797-scan corpus, 1500 train /
297 test, class-balanced round-robin — (+ a ``SHA256SUMS`` manifest that
``loaders._verify_checksums`` checks at load time) in the npz schema the
loader consumes.  Deterministic: same sklearn corpus -> same bytes.

If you have the actual MNIST idx files, point ``CLIFFORDTPU_DATA_DIR`` at
them instead — this shard is only the offline stand-in.
"""

import hashlib
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(ROOT, "tests", "data", "mnist")
N_TRAIN, N_TEST = 1500, 297


def main():
    from sklearn.datasets import load_digits

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    d = load_digits()
    imgs = d.images.astype(np.float32) / 16.0  # (1797, 8, 8) in [0,1]
    labels = d.target.astype(np.int64)

    # deterministic class-balanced pick: first examples of each class in
    # corpus order, round-robin, train then test (no RNG involved)
    order = []
    per_class = {c: list(np.where(labels == c)[0]) for c in range(10)}
    while len(order) < N_TRAIN + N_TEST:
        for c in range(10):
            if per_class[c]:
                order.append(per_class[c].pop(0))
    order = np.asarray(order[: N_TRAIN + N_TEST])

    up = np.asarray(
        jax.image.resize(
            jnp.asarray(imgs[order])[..., None],
            (len(order), 28, 28, 1),
            method="bilinear",
        )
    )[..., 0]
    up8 = np.clip(np.round(up * 255.0), 0, 255).astype(np.uint8)

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "mnist.npz")
    np.savez_compressed(
        path,
        x_train=up8[:N_TRAIN],
        y_train=labels[order[:N_TRAIN]],
        x_test=up8[N_TRAIN:],
        y_test=labels[order[N_TRAIN:]],
    )
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    with open(os.path.join(OUT_DIR, "SHA256SUMS"), "w") as f:
        f.write(f"{digest}  mnist.npz\n")
    print(f"wrote {path} ({os.path.getsize(path)} bytes, sha256 {digest})")


if __name__ == "__main__":
    main()
