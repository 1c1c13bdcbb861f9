"""Semi-supervised kNN evaluation (``mnist/mnist_clifpws.py:46-81``).

Latents come from the posterior mean (``encode_dataset`` uses ``encode()``'s
mu); metric is cosine for spherical/torus families, euclidean otherwise.
Two backends: sklearn (exact reference parity) and a pure-JAX top-k
majority vote that runs on device for large sweeps.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def encode_dataset(handle, x, y, batch: int = 500, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)
    zs = []
    for s in range(0, len(x), batch):
        zs.append(np.asarray(
            handle.latent_mu(x[s:s + batch], jax.random.fold_in(key, s))))
    return np.concatenate(zs, 0), np.asarray(y)


def _knn_predict_jax(X_train, y_train, X_test, metric: str, k: int = 5,
                     n_classes: int = 10):
    Xtr = jnp.asarray(X_train)
    Xte = jnp.asarray(X_test)
    if metric == "cosine":
        Xtr = Xtr / jnp.clip(jnp.linalg.norm(Xtr, axis=-1, keepdims=True),
                             min=1e-12)
        Xte = Xte / jnp.clip(jnp.linalg.norm(Xte, axis=-1, keepdims=True),
                             min=1e-12)
        sims = Xte @ Xtr.T
    else:
        sims = -(
            jnp.sum(Xte**2, -1, keepdims=True)
            - 2 * Xte @ Xtr.T
            + jnp.sum(Xtr**2, -1)[None, :]
        )
    _, idx = jax.lax.top_k(sims, k)
    votes = jnp.asarray(y_train)[idx]  # (n_test, k)
    counts = jax.vmap(
        lambda v: jnp.bincount(v, length=n_classes))(votes)
    return np.asarray(jnp.argmax(counts, axis=-1))


def perform_knn_evaluation(
    handle, x_train, y_train, x_test, y_test,
    n_samples_list: Sequence[int] = (100, 600, 1000),
    backend: str = "sklearn",
    rng: np.random.Generator | None = None,
    key=None,
) -> Dict[str, float]:
    rng = rng or np.random.default_rng()
    X_train_full, y_train_full = encode_dataset(handle, x_train, y_train,
                                                key=key)
    X_test, y_test = encode_dataset(handle, x_test, y_test, key=key)

    metric = ("cosine" if handle.distribution in
              ("powerspherical", "clifford") else "euclidean")

    results = {}
    for n_samples in n_samples_list:
        n_samples_eff = min(n_samples, len(X_train_full))
        indices = rng.choice(len(X_train_full), n_samples_eff, replace=False)
        Xs, ys = X_train_full[indices], y_train_full[indices]

        if backend == "sklearn":
            from sklearn.metrics import accuracy_score, f1_score
            from sklearn.neighbors import KNeighborsClassifier

            knn = KNeighborsClassifier(n_neighbors=5, metric=metric)
            knn.fit(Xs, ys)
            y_pred = knn.predict(X_test)
            acc = accuracy_score(y_test, y_pred)
            f1 = f1_score(y_test, y_pred, average="macro")
        else:
            y_pred = _knn_predict_jax(Xs, ys, X_test, metric)
            acc = float((y_pred == y_test).mean())
            # macro F1
            f1s = []
            for c in np.unique(y_test):
                tp = np.sum((y_pred == c) & (y_test == c))
                fp = np.sum((y_pred == c) & (y_test != c))
                fn = np.sum((y_pred != c) & (y_test == c))
                prec = tp / max(1, tp + fp)
                rec = tp / max(1, tp + fn)
                f1s.append(0.0 if prec + rec == 0
                           else 2 * prec * rec / (prec + rec))
            f1 = float(np.mean(f1s))

        results[f"knn_acc_{n_samples}"] = float(acc)
        results[f"knn_f1_{n_samples}"] = float(f1)
        print(f"  knn acc w/ {n_samples} for train, test: "
              f"{acc:.4f}, f1: {f1:.4f}")
    return results
