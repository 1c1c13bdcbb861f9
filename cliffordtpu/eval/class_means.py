"""Class-mean latent classifier (``utils/wandb_utils.py:392-456``).

Reproduces the reference's divisor quirk: class means divide by
``min(count, 10)`` not ``count`` (``wandb_utils.py:413``).  This makes the
"means" scaled sums for classes with >10 examples; cosine similarity is
scale-invariant so ``evaluate_mean_vector_cosine`` is unaffected, but the
vectors themselves match the reference.  Pass ``true_mean=True`` for the
corrected divisor.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.vsa.ops import normalize_vectors


def compute_class_means(
    handle, x, y, max_per_class: int = 1000, batch: int = 200,
    key=None, true_mean: bool = False,
) -> Dict[int, jnp.ndarray]:
    key = key if key is not None else jax.random.PRNGKey(0)
    y = np.asarray(y)
    sums: Dict[int, np.ndarray] = {}
    counts: Dict[int, int] = {}
    for s in range(0, len(x), batch):
        mu = np.asarray(handle.latent_mu(x[s:s + batch],
                                         jax.random.fold_in(key, s)))
        for i, label in enumerate(y[s:s + batch].tolist()):
            if label not in counts:
                counts[label] = 0
                sums[label] = np.zeros_like(mu[i])
            if counts[label] < max_per_class:
                sums[label] = sums[label] + mu[i]
                counts[label] += 1

    means = {}
    for label, total in sums.items():
        c = max(1, counts[label]) if true_mean else max(
            1, min(counts[label], 10))  # reference quirk (:413)
        vec = jnp.asarray(total / c)
        if handle.distribution == "powerspherical":
            vec = normalize_vectors(vec)
        means[label] = vec
    return means


def evaluate_mean_vector_cosine(
    handle, x, y, class_means: Dict[int, jnp.ndarray],
    batch: int = 200, key=None,
) -> Tuple[float, Dict[int, float]]:
    """Nearest-class-mean by cosine (``wandb_utils.py:423-456``)."""
    key = key if key is not None else jax.random.PRNGKey(1)
    labels_sorted = sorted(class_means.keys())
    mean_matrix = normalize_vectors(
        jnp.stack([class_means[k] for k in labels_sorted], 0))
    y = np.asarray(y)
    correct, total = 0, 0
    per_class_correct = {k: 0 for k in labels_sorted}
    per_class_total = {k: 0 for k in labels_sorted}
    for s in range(0, len(x), batch):
        mu = handle.latent_mu(x[s:s + batch], jax.random.fold_in(key, s))
        sims = normalize_vectors(mu) @ mean_matrix.T
        preds = np.asarray(jnp.argmax(sims, axis=1))
        yb = y[s:s + batch]
        for yi, pi in zip(yb.tolist(), preds.tolist()):
            per_class_total[yi] = per_class_total.get(yi, 0) + 1
            if yi == labels_sorted[pi]:
                per_class_correct[yi] = per_class_correct.get(yi, 0) + 1
                correct += 1
            total += 1
    acc = correct / max(1, total)
    per_class_acc = {
        k: per_class_correct.get(k, 0) / max(1, per_class_total.get(k, 0))
        for k in labels_sorted
    }
    return acc, per_class_acc
