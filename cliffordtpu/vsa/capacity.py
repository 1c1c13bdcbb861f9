"""VSA capacity experiments — vectorized rebuilds of ``utils/vsa.py:99-630``.

The reference runs Python loops over (k, trial, item); here each k's trials
are a single vmapped program and retrieval is one matmul against the item
memory — the main eval-battery speedup on TPU.

Returned dict schemas and plot filenames match the reference byte-for-byte
(``{"k": [...], "accuracy": [...], "std": [...]}``,
``bundle_capacity.png`` / ``role_filler_capacity.png`` /
``bundle_similarity_matrix*.png``) so downstream JSON/plot consumers are
drop-in compatible.
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.utils import stable_hash
from cliffordtpu.vsa.ops import (
    bind,
    bundle,
    hrr_init,
    normalize_vectors,
    permute_vector,
    similarity,
    unbind,
    unitary_init,
    unpermute_vector,
)


def _prep_memory(key, item_memory, n_items, d, normalize):
    if item_memory is None:
        item_memory = hrr_init(key, n_items, d)
    else:
        item_memory = jnp.asarray(item_memory)[:n_items]
    if normalize:
        item_memory = normalize_vectors(item_memory)
    return item_memory


def _bundle_capacity_trial(key, item_memory, k):
    n_items = item_memory.shape[0]
    idx = jax.random.permutation(key, n_items)[: 2 * k]
    X = item_memory[idx[:k]]
    Xp = item_memory[idx[k: 2 * k]]
    C1 = bundle(X, normalize=True)
    C2 = bundle(Xp, normalize=True)
    s1 = similarity(X, C1[None, :])
    s2 = similarity(X, C2[None, :])
    return (s1 > s2).astype(jnp.float32).mean()


def test_bundle_capacity(
    d: int = 1024,
    n_items: int = 1000,
    k_range=None,
    n_trials: int = 20,
    normalize: bool = True,
    plot: bool = False,
    save_dir: Optional[str] = None,
    item_memory=None,
    use_braiding: bool = False,  # signature parity; unused like the reference
    bind_with_random: bool = False,
    baseline_d: Optional[int] = None,
    key=None,
) -> Dict:
    """Bundle retrieval capacity (``utils/vsa.py:99-221``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_mem, key = jax.random.split(key)
    item_memory = _prep_memory(k_mem, item_memory, n_items, d, normalize)
    n_avail = item_memory.shape[0]
    if k_range is None:
        k_range = list(range(2, min(51, n_avail // 2), 2))

    trial_fn = jax.jit(
        jax.vmap(_bundle_capacity_trial, in_axes=(0, None, None)),
        static_argnums=(2,),
    )
    results = {"k": [], "accuracy": [], "std": []}
    for k in k_range:
        actual_k = min(2 * k, n_avail) // 2
        if actual_k < 1:
            accs = jnp.zeros((n_trials,))
        else:
            keys = jax.random.split(jax.random.fold_in(key, k), n_trials)
            accs = trial_fn(keys, item_memory, actual_k)
        results["k"].append(k)
        results["accuracy"].append(float(jnp.mean(accs)))
        results["std"].append(float(jnp.std(accs)))

    if plot:
        _plot_capacity_curve(
            results, k_range, d, n_items, normalize,
            baseline_d=baseline_d, save_dir=save_dir,
            kind="bundle", key=jax.random.fold_in(key, 999),
            n_trials=min(n_trials, 10),
        )
    return results


def _role_filler_trial(key, item_memory, roles_pool, k, unbind_method,
                       bind_with_random, use_braiding, normalize):
    """One trial: bind k pairs, bundle, recover every filler by argmax cosine."""
    n_items = item_memory.shape[0]
    d = item_memory.shape[-1]
    k_idx, k_roles, k_perm = jax.random.split(key, 3)
    if bind_with_random:
        idx = jax.random.permutation(k_idx, n_items)[:k]
        fillers = item_memory[idx]
        # pick k unitary roles from a pre-generated pool
        ridx = jax.random.permutation(k_roles, roles_pool.shape[0])[:k]
        roles = roles_pool[ridx]
        if normalize:
            roles = normalize_vectors(roles)
        target_idx = idx
    else:
        idx = jax.random.permutation(k_idx, n_items)[: 2 * k]
        roles = item_memory[idx[:k]]
        fillers = item_memory[idx[k: 2 * k]]
        target_idx = idx[k: 2 * k]

    pairs = bind(roles, fillers)

    if use_braiding:
        perms = jax.vmap(
            lambda kk: jax.random.permutation(kk, d)
        )(jax.random.split(k_perm, k))
        braided = jax.vmap(permute_vector)(pairs, perms)
        bundled = bundle(braided, normalize=True)
        unb_in = jax.vmap(lambda p: unpermute_vector(bundled, p))(perms)
    else:
        bundled = bundle(pairs, normalize=True)
        unb_in = jnp.broadcast_to(bundled, (k, d))

    recovered = unbind(unb_in, roles, method=unbind_method)  # (k, d)
    rec_n = normalize_vectors(recovered)
    mem_n = normalize_vectors(item_memory)
    sims = rec_n @ mem_n.T  # (k, n_items)
    best = jnp.argmax(sims, axis=-1)
    return (best == target_idx).astype(jnp.float32).mean()


def test_binding_unbinding_pairs(
    d: int = 1024,
    n_items: int = 1000,
    k_range=None,
    n_trials: int = 20,
    normalize: bool = True,
    plot: bool = False,
    unbind_method: str = "inv",
    save_dir: Optional[str] = None,
    item_memory=None,
    use_braiding: bool = False,
    bind_with_random: bool = True,
    baseline_d: Optional[int] = None,
    key=None,
) -> Dict:
    """Role-filler binding capacity (``utils/vsa.py:224-398``).

    The reference pins this to CPU because "cuFFT chokes on large flattened
    latent dims" (``:266-267``); the TPU rfft/matmul path has no such
    limitation, so everything stays on device.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    k_mem, k_pool, key = jax.random.split(key, 3)
    item_memory = _prep_memory(k_mem, item_memory, n_items, d, normalize)
    n_avail = item_memory.shape[0]
    dd = item_memory.shape[-1]
    if k_range is None:
        k_range = list(range(2, min(31, n_avail // 4), 2))
    max_k = max(k_range) if k_range else 2
    roles_pool = (
        unitary_init(k_pool, max(2 * max_k, 64), dd)
        if bind_with_random else jnp.zeros((1, dd))
    )

    trial_fn = jax.jit(
        jax.vmap(
            _role_filler_trial,
            in_axes=(0, None, None, None, None, None, None, None),
        ),
        static_argnums=(3, 4, 5, 6, 7),
    )
    results = {"k": [], "accuracy": [], "std": []}
    for k in k_range:
        keys = jax.random.split(jax.random.fold_in(key, k), n_trials)
        accs = trial_fn(keys, item_memory, roles_pool, k, unbind_method,
                        bind_with_random, use_braiding, normalize)
        results["k"].append(k)
        results["accuracy"].append(float(jnp.mean(accs)))
        results["std"].append(float(jnp.std(accs)))

    if plot:
        _plot_capacity_curve(
            results, k_range, d, n_items, normalize,
            baseline_d=baseline_d, save_dir=save_dir,
            kind="role_filler", key=jax.random.fold_in(key, 998),
            n_trials=min(n_trials, 10), unbind_method=unbind_method,
            bind_with_random=bind_with_random,
        )
    return results


def _plot_capacity_curve(results, k_range, d, n_items, normalize, *,
                         baseline_d, save_dir, kind, key, n_trials,
                         unbind_method="inv", bind_with_random=True):
    """Shared plot with HRR + unitary baselines recomputed inline
    (``utils/vsa.py:169-219`` / ``:334-396``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    bd = baseline_d if baseline_d is not None else d
    baselines = {}
    for bname, init_fn in [("HRR", hrr_init), ("unitary", unitary_init)]:
        bkey = jax.random.fold_in(key, stable_hash(bname) % 1000)
        bvecs = init_fn(bkey, n_items, bd)
        if kind == "bundle":
            b_res = test_bundle_capacity(
                d=bd, n_items=n_items, k_range=k_range, n_trials=n_trials,
                normalize=normalize, item_memory=bvecs, plot=False,
                key=jax.random.fold_in(bkey, 1),
            )
        else:
            b_res = test_binding_unbinding_pairs(
                d=bd, n_items=n_items, k_range=k_range, n_trials=n_trials,
                normalize=normalize, item_memory=bvecs, plot=False,
                unbind_method=unbind_method,
                bind_with_random=bind_with_random,
                key=jax.random.fold_in(bkey, 1),
            )
        baselines[bname] = b_res

    display_d = baseline_d if baseline_d is not None else d
    plt.figure(figsize=(8, 5))
    marker = "o" if kind == "bundle" else "s"
    plt.errorbar(results["k"], results["accuracy"], yerr=results["std"],
                 marker=marker, capsize=3, label="Learned Latents",
                 color="tab:blue", linewidth=2)
    plt.errorbar(baselines["HRR"]["k"], baselines["HRR"]["accuracy"],
                 yerr=baselines["HRR"]["std"], marker="^", capsize=3,
                 label="HRR (Random)", color="tab:gray", linestyle="--",
                 alpha=0.8)
    plt.errorbar(baselines["unitary"]["k"], baselines["unitary"]["accuracy"],
                 yerr=baselines["unitary"]["std"], marker="v", capsize=3,
                 label="Random Unitary", color="tab:green", linestyle="--",
                 alpha=0.8)
    if kind == "bundle":
        plt.xlabel("Number of Bundled Vectors ($k$)")
        plt.ylabel("Retrieval Accuracy")
        plt.title(f"Bundle Capacity ($d={display_d}$, $N={n_items}$)")
        fname = "bundle_capacity.png"
    else:
        bind_label = " (Random Keys)" if bind_with_random else ""
        plt.xlabel("Number of Bundled Role-Filler Pairs ($k$)")
        plt.ylabel("Unbinding Accuracy")
        plt.title(
            f"Role-Filler Query Capacity{bind_label} "
            f"($d={display_d}$, $N={n_items}$)"
        )
        fname = "role_filler_capacity.png"
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.ylim(0, 1.05)
    plt.tight_layout()
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
        plt.savefig(os.path.join(save_dir, fname), dpi=300)
    plt.close()


def test_per_class_bundle_capacity_k_items(
    d: int = 1024,
    n_items: int = 1000,
    n_classes: int = 10,
    items_per_class: int = 2,
    n_trials: int = 1,
    normalize: bool = True,
    plot: bool = False,
    save_dir: Optional[str] = None,
    item_memory=None,
    labels=None,
    item_images=None,
    use_braiding: bool = False,
    per_class_braid: bool = False,
    class_names=None,
    key=None,
) -> Dict:
    """Per-class item similarity matrix (``utils/vsa.py:402-630``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k_mem, k_lbl, k_braid = jax.random.split(key, 3)
    if item_memory is None:
        item_memory = hrr_init(k_mem, n_items, d)
        labels = jax.random.randint(k_lbl, (n_items,), 0, n_classes)
    else:
        item_memory = jnp.asarray(item_memory)[:n_items]
        if labels is None:
            labels = jax.random.randint(k_lbl, (item_memory.shape[0],), 0,
                                        n_classes)
        else:
            labels = jnp.asarray(labels)[: item_memory.shape[0]]
    if normalize:
        item_memory = normalize_vectors(item_memory)
    labels = np.asarray(labels)
    dd = item_memory.shape[-1]

    if use_braiding:
        if per_class_braid:
            class_perm = {
                int(c): jax.random.permutation(
                    jax.random.fold_in(k_braid, int(c)), dd)
                for c in np.unique(labels)
            }
            perms = jnp.stack([class_perm[int(c)] for c in labels])
        else:
            perms = jax.vmap(lambda kk: jax.random.permutation(kk, dd))(
                jax.random.split(k_braid, item_memory.shape[0])
            )
        item_memory = jax.vmap(permute_vector)(item_memory, perms)

    unique_classes = np.unique(labels)
    if len(unique_classes) < n_classes:
        n_classes = len(unique_classes)

    sel_idx, sel_labels = [], []
    for c in unique_classes[:n_classes]:
        cls_idx = np.where(labels == c)[0]
        if len(cls_idx) >= items_per_class:
            sel_idx.extend(cls_idx[:items_per_class].tolist())
            sel_labels.extend([int(c)] * items_per_class)
    if not sel_idx:
        return {"avg_similarity_matrix": None}

    bundles = item_memory[jnp.asarray(sel_idx)]
    bn = normalize_vectors(bundles)
    sim_matrix = np.asarray(bn @ bn.T)

    results = {
        "avg_similarity_matrix": sim_matrix,
        "std_similarity_matrix": np.zeros_like(sim_matrix),
        "n_bundles": len(sel_idx),
        "n_classes": n_classes,
        "items_per_class": items_per_class,
    }

    if plot and save_dir:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.gridspec import GridSpec

        os.makedirs(save_dir, exist_ok=True)
        fig = plt.figure(figsize=(16, 8))
        gs = GridSpec(1, 2, width_ratios=[1, 0.5], wspace=0.3)
        ax_sim = fig.add_subplot(gs[0])
        im = ax_sim.imshow(sim_matrix, cmap="viridis", aspect="auto")
        braid_label = (" (Per-Class Braiding)" if per_class_braid
                       else " (Random Braiding)" if use_braiding else "")
        ax_sim.set_title(
            f"Bundle Similarity Matrix{braid_label}\n"
            f"({items_per_class} Item per Class, {n_classes} Classes)",
            fontsize=14, fontweight="bold",
        )
        tick_labels = []
        for c in unique_classes[:n_classes]:
            name = (class_names[int(c)] if class_names and
                    int(c) < len(class_names) else str(int(c)))
            if items_per_class == 1:
                tick_labels.append(name)
            else:
                tick_labels.extend(
                    f"{name}.{j + 1}" for j in range(items_per_class))
        ax_sim.set_xticks(range(len(tick_labels)))
        ax_sim.set_yticks(range(len(tick_labels)))
        ax_sim.set_xticklabels(tick_labels, rotation=90)
        ax_sim.set_yticklabels(tick_labels)
        ax_sim.set_xlabel("Bundle Index", fontsize=12)
        ax_sim.set_ylabel("Bundle Index", fontsize=12)
        plt.colorbar(im, ax=ax_sim, label="cosine similarity")

        ax_images = fig.add_subplot(gs[1])
        ax_images.axis("off")
        if item_images is not None and len(sel_idx) > 0:
            imgs = np.asarray(item_images)
            # NHWC expected; tolerate NCHW
            if imgs.ndim == 4 and imgs.shape[1] in (1, 3) and \
                    imgs.shape[1] < imgs.shape[-1]:
                imgs = imgs.transpose(0, 2, 3, 1)
            ih, iw, ic = imgs.shape[1:]
            canvas = np.ones((n_classes * ih, items_per_class * iw, ic)) * 0.5
            for pos, img_idx in enumerate(sel_idx):
                r, c0 = divmod(pos, items_per_class)
                img = np.clip(imgs[img_idx] * 0.5 + 0.5, 0, 1)
                canvas[r * ih:(r + 1) * ih, c0 * iw:(c0 + 1) * iw] = img
            if ic == 1:
                ax_images.imshow(canvas[..., 0], cmap="gray")
            else:
                ax_images.imshow(canvas)
            ax_images.set_title(
                f"Images ({n_classes} Classes $\\times$ "
                f"{items_per_class} Items)",
                fontsize=12, fontweight="bold",
            )

        fname = ("bundle_similarity_matrix_per_class_braid.png"
                 if per_class_braid else
                 "bundle_similarity_matrix_braid.png" if use_braiding else
                 "bundle_similarity_matrix.png")
        plt.savefig(os.path.join(save_dir, fname), dpi=300)
        plt.close()

    return results


# these are VSA *evaluations* named test_* for reference parity, not pytest
# tests (SURVEY.md §4) — keep pytest from collecting them on import
test_bundle_capacity.__test__ = False
test_binding_unbinding_pairs.__test__ = False
test_per_class_bundle_capacity_k_items.__test__ = False
