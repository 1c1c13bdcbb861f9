"""Binding-depth and bind/bundle decode experiments
(``utils/wandb_utils.py:45-293, 567-657, 1272-1533``).

The bind/unbind chains are jax.lax.scan'ed (the reference's Python loops over
depth m re-bind from scratch per m — O(m^2); here each curve is one O(m)
scan pass that records every intermediate depth, with identical results for
the same vectors).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.utils import stable_hash
from cliffordtpu.vsa.ops import (
    bind,
    hrr_init,
    normalize_vectors,
    similarity,
    unbind,
    unitary_init,
)


def _bind_unbind_depth_curve(target, partners, unbind_method):
    """cos(recover_m, target) for m = 1..M in one scan.

    recover_m = unbind^m(bind^m(target, p_1..p_m)); since unbind is applied
    in exact reverse order, recover_m == unbind(recover at depth m applied
    stepwise)... computed directly: bound_m = bind(bound_{m-1}, p_m);
    rec_m = chain-unbind.  We scan bound_m, then for each m scan the
    unbind chain — but because unbind(bind(x, p), p) != x only through
    accumulated noise, the whole double loop collapses: rec_m can be
    computed incrementally as noise accumulates symmetrically.  For exact
    parity with the reference we do the O(m) bind scan and a full unbind
    chain per recorded depth (vmapped over depths).
    """
    M = partners.shape[0]

    def bind_step(carry, p):
        nxt = bind(carry, p)
        return nxt, nxt

    _, bounds = jax.lax.scan(bind_step, target, partners)  # (M, d)

    def recover(m):
        def unbind_step(i, carry):
            # unbind partners in reverse order: index m-1-i, masked for i>=m
            idx = jnp.maximum(m - 1 - i, 0)
            upd = unbind(carry, partners[idx], method=unbind_method)
            return jnp.where(i < m, upd, carry)

        start = bounds[jnp.maximum(m - 1, 0)]
        rec = jax.lax.fori_loop(0, M, lambda i, c: unbind_step(i, c), start)
        return similarity(rec, target)

    sims = jax.vmap(recover)(jnp.arange(1, M + 1))
    return sims  # (M,)


_depth_curve_jit = jax.jit(
    jax.vmap(_bind_unbind_depth_curve, in_axes=(0, 0, None)),
    static_argnums=(2,),
)


def test_self_binding(
    handle,
    x,
    y,
    output_dir: str,
    k_self_bind: int = 40,
    unbind_method: str = "*",
    img_shape=(28, 28, 1),
    n_trials: int = 10,
    key=None,
) -> Dict:
    """Schlegel §3.2 binding-depth test (``wandb_utils.py:45-293``):
    self-binding and random-latent-partner curves, HRR/unitary baselines at
    the encoder dim, decoded recovery grid."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    k_enc, k_sel, k_base, k_rec = jax.random.split(key, 4)
    all_z, all_labels = handle.collect_flat_z(x, y, k_enc, limit=200)
    if handle.distribution == "gaussian":
        all_z = normalize_vectors(all_z)
    n, dflat = all_z.shape
    max_depth = min(k_self_bind, n - 1)
    depths = list(range(1, max_depth + 1))

    # --- curve 1: self-binding ---
    tidx = jax.random.randint(k_sel, (n_trials,), 0, n)
    targets = all_z[tidx]
    self_partners = jnp.repeat(targets[:, None, :], max_depth, axis=1)
    self_sims = np.asarray(
        _depth_curve_jit(targets, self_partners, unbind_method))
    self_means, self_stds = self_sims.mean(0), self_sims.std(0)

    # --- curve 2: random-partner binding ---
    pkeys = jax.random.split(jax.random.fold_in(k_sel, 1), n_trials)
    pidx = jax.vmap(
        lambda kk: jax.random.permutation(kk, n)[:max_depth])(pkeys)
    partners = all_z[pidx]
    rand_sims = np.asarray(_depth_curve_jit(targets, partners, unbind_method))
    rand_means, rand_stds = rand_sims.mean(0), rand_sims.std(0)

    cos_sim = float(rand_means[-1]) if len(rand_means) else 0.0

    os.makedirs(output_dir, exist_ok=True)
    path_bind_curve = os.path.join(
        output_dir, f"similarity_after_k_binds_{unbind_method}.png")
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(depths, self_means, "o-", markersize=5, label="Self-Binding",
            color="tab:blue", linewidth=2)
    ax.fill_between(depths, self_means - self_stds, self_means + self_stds,
                    alpha=0.15, color="tab:blue")
    ax.plot(depths, rand_means, "s-", markersize=5,
            label="Random Latent Partners", color="tab:orange", linewidth=2)
    ax.fill_between(depths, rand_means - rand_stds, rand_means + rand_stds,
                    alpha=0.15, color="tab:orange")

    # baselines at the encoder dim (``wandb_utils.py:157-185``)
    d = handle.latent_dim or dflat
    for bname, init_fn, color, marker in [
        ("HRR (Random)", hrr_init, "tab:gray", "^"),
        ("Random Unitary", unitary_init, "tab:green", "v"),
    ]:
        bkeys = jax.random.split(
            jax.random.fold_in(k_base, stable_hash(bname) % 97), n_trials)
        bvecs = jax.vmap(
            lambda kk: normalize_vectors(init_fn(kk, max_depth + 1, d))
        )(bkeys)  # (trials, M+1, d)
        b_sims = np.asarray(_depth_curve_jit(
            bvecs[:, 0, :], bvecs[:, 1:, :], unbind_method))
        b_means, b_stds = b_sims.mean(0), b_sims.std(0)
        ax.plot(depths, b_means, marker=marker, markersize=5, label=bname,
                color=color, linestyle="--", alpha=0.8)
        ax.fill_between(depths, b_means - b_stds, b_means + b_stds,
                        alpha=0.08, color=color)

    ax.set_ylim(-0.1, 1.05)
    ax.set_xlabel("Binding Depth $m$")
    ax.set_ylabel("Cosine Similarity to Original")
    ax.set_title(f"Approximate Inverse Binding Depth ($d={d}$)")
    ax.legend()
    ax.grid(alpha=0.3)
    plt.tight_layout()
    plt.savefig(path_bind_curve, dpi=300, bbox_inches="tight")
    plt.close()

    # --- decoded recovery grid (``wandb_utils.py:199-281``) ---
    recon_path = None
    try:
        recon_every = max(1, max_depth // 5)
        recon_depths = [m for m in depths
                        if m % recon_every == 0 or m == max_depth]
        labels_np = np.asarray(all_labels)
        uniq = np.unique(labels_np)[:3]
        ex_indices = [int(np.where(labels_np == u)[0][0]) for u in uniq]
        if ex_indices:
            rows = []
            for r, ex in enumerate(ex_indices):
                target = all_z[ex]
                pp = jax.random.permutation(
                    jax.random.fold_in(k_rec, r), n)[:max_depth]
                # avoid the target itself as partner
                pp = jnp.where(pp == ex, (pp + 1) % n, pp)
                parts = all_z[pp]
                row = [target]
                for m in recon_depths:
                    bound = target
                    for i in range(m):
                        bound = bind(bound, parts[i])
                    rec = bound
                    for i in range(m - 1, -1, -1):
                        rec = unbind(rec, parts[i], method=unbind_method)
                    row.append(rec)
                rows.append(row)
            from cliffordtpu.eval.plots import to_image

            flat = jnp.stack([v for row in rows for v in row], 0)
            imgs = np.asarray(to_image(handle, handle.decode(flat)))
            imgs = imgs.reshape(-1, *img_shape)
            n_rows, n_cols = len(rows), len(rows[0])
            canvas = np.zeros((n_rows * imgs.shape[1],
                               n_cols * imgs.shape[2], imgs.shape[3]))
            k = 0
            for r in range(n_rows):
                for cc in range(n_cols):
                    canvas[r * imgs.shape[1]:(r + 1) * imgs.shape[1],
                           cc * imgs.shape[2]:(cc + 1) * imgs.shape[2]] = imgs[k]
                    k += 1
            recon_path = os.path.join(
                output_dir, f"recon_after_k_binds_{unbind_method}.png")
            fig, ax = plt.subplots(
                figsize=(max(12, n_cols * 1.5), max(4, n_rows * 2)))
            if canvas.shape[-1] == 1:
                ax.imshow(canvas[..., 0], cmap="gray")
            else:
                ax.imshow(canvas)
            col_labels = ["original"] + [f"m={m}" for m in recon_depths]
            iw, ih = imgs.shape[2], imgs.shape[1]
            ax.set_xticks([iw * i + iw // 2 for i in range(n_cols)])
            ax.set_xticklabels(col_labels, fontsize=8)
            ax.set_yticks([ih * i + ih // 2 for i in range(n_rows)])
            ax.set_yticklabels([f"class {int(u)}" for u in uniq], fontsize=9)
            ax.set_title(
                "Decoded Recovery After $m$ Sequential Bind-Unbind Cycles")
            plt.tight_layout()
            plt.savefig(recon_path, dpi=300, bbox_inches="tight")
            plt.close()
    except Exception as e:  # degrade like the reference (:283-285)
        print(e)
        recon_path = None

    return {
        "binding_k_self_similarity": cos_sim,
        "similarity_after_k_binds_plot_path": path_bind_curve,
        "recon_after_k_binds_plot_path": recon_path,
        "k_sims": [float(v) for v in rand_means],
        "k_values": depths,
    }


def test_vsa_operations(
    handle, x, y, output_dir: str,
    n_test_pairs: int = 50,
    unbind_method: str = "*",
    normalize: bool = True,
    key=None,
) -> Dict:
    """Single bind/unbind cosine histogram (``wandb_utils.py:567-657``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    k_enc, k_pick = jax.random.split(key)
    z_all = handle.latent_mu(x[: n_test_pairs * 2], k_enc)
    if handle.distribution == "powerspherical" or normalize:
        z_all = normalize_vectors(z_all)
    n = z_all.shape[0]
    m = min(n_test_pairs, n // 2)
    key_idx = jax.random.randint(k_pick, (m,), 0, n)
    keys_v = z_all[key_idx]
    values = z_all[:m]
    rec = unbind(bind(keys_v, values), keys_v, method=unbind_method)
    sims = np.asarray(similarity(rec, values))

    path = None
    if len(sims):
        os.makedirs(output_dir, exist_ok=True)
        path = os.path.join(output_dir, f"vsa_bind_unbind_{unbind_method}.png")
        plt.figure(figsize=(10, 4))
        plt.subplot(1, 2, 1)
        plt.hist(sims, bins=20, alpha=0.8, edgecolor="black")
        plt.axvline(sims.mean(), color="red", linestyle="--",
                    label=f"Mean: {sims.mean():.3f}")
        plt.xlabel("Cosine Similarity")
        plt.ylabel("Count")
        plt.title("Binding and Unbinding Performance")
        plt.legend()
        plt.grid(alpha=0.3)
        plt.subplot(1, 2, 2)
        plt.plot(sims, "o-", alpha=0.8, markersize=5)
        plt.axhline(sims.mean(), color="red", linestyle="--", alpha=0.8)
        plt.xlabel("Test Index")
        plt.ylabel("Cosine Similarity")
        plt.title("Per-Test Cosine Similarity")
        plt.grid(alpha=0.3)
        plt.tight_layout()
        plt.savefig(path, dpi=300, bbox_inches="tight")
        plt.close()

    return {
        "vsa_bind_unbind_similarity": float(sims.mean()) if len(sims) else 0.0,
        "vsa_bind_unbind_plot": path,
    }


def test_pairwise_bind_bundle_decode(
    handle, x, y, output_dir: str,
    img_shape=(32, 32, 1),
    unbind_method: str = "*",
    class_names=None,
    key=None,
) -> Dict:
    """For all class pairs: decode bind(a,b), bundle, and unbind recoveries;
    6-column image grid (``wandb_utils.py:1272-1396``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    z_all, labels = handle.collect_flat_z(x, y, key, limit=400)
    labels = np.asarray(labels)
    classes = np.unique(labels)[:10]
    reps = {}
    for c in classes:
        idx = np.where(labels == c)[0]
        if len(idx):
            reps[int(c)] = z_all[int(idx[0])]
    pairs = [(a, b) for i, a in enumerate(sorted(reps))
             for b in sorted(reps)[i + 1:]]
    if not pairs:
        return {"avg_unbind_similarity": 0.0, "plot_path": None}

    rows = []
    sims = []
    for a, b in pairs:
        za, zb = reps[a], reps[b]
        bound = bind(za, zb)
        bundled = (za + zb) / np.sqrt(2.0)
        rec_a = unbind(bound, zb, method=unbind_method)
        rec_b = unbind(bound, za, method=unbind_method)
        sims.append(0.5 * (float(similarity(rec_a, za))
                           + float(similarity(rec_b, zb))))
        rows.append([za, zb, bound, bundled, rec_a, rec_b])

    from cliffordtpu.eval.plots import to_image

    flat = jnp.stack([v for row in rows for v in row], 0)
    imgs = np.asarray(to_image(handle, handle.decode(flat)))
    imgs = imgs.reshape(-1, *img_shape)
    n_rows, n_cols = len(rows), 6
    ih, iw = imgs.shape[1], imgs.shape[2]
    canvas = np.zeros((n_rows * ih, n_cols * iw, imgs.shape[3]))
    k = 0
    for r in range(n_rows):
        for c in range(n_cols):
            canvas[r * ih:(r + 1) * ih, c * iw:(c + 1) * iw] = imgs[k]
            k += 1

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir,
                        f"pairwise_bind_bundle_{unbind_method}.png")
    fig, ax = plt.subplots(figsize=(n_cols * 1.6, max(6, n_rows * 1.1)))
    if canvas.shape[-1] == 1:
        ax.imshow(canvas[..., 0], cmap="gray")
    else:
        ax.imshow(canvas)
    col_labels = ["a", "b", "a (*) b", "bundle", "rec a", "rec b"]
    ax.set_xticks([iw * i + iw // 2 for i in range(n_cols)])
    ax.set_xticklabels(col_labels, fontsize=8)

    def _cname(c):
        return (class_names[c] if class_names and c < len(class_names)
                else str(c))

    ax.set_yticks([ih * i + ih // 2 for i in range(n_rows)])
    ax.set_yticklabels([f"{_cname(a)}-{_cname(b)}" for a, b in pairs],
                       fontsize=7)
    ax.set_title("Pairwise Bind / Bundle / Unbind Decodes")
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()

    return {
        "avg_unbind_similarity": float(np.mean(sims)),
        "plot_path": path,
    }


def test_cross_class_bind_unbind(
    handle, x, y, output_dir: str,
    class_a: int = 6, class_b: int = 9,
    img_shape=(28, 28, 1),
    class_names=None,
    key=None,
) -> Dict:
    """One class pair, both unbind methods, reference 2x4 grid
    (``wandb_utils.py:1399-1533``):

    - row 1: A | B | decode(bind(A,B)) | decode(bundle(A,B)),
      bundle = (a+b)/sqrt(2) (``:1459``)
    - row 2: rec A (*) | rec B (*) | rec A (dagger) | rec B (dagger)
    - gaussian latents are L2-normalized BEFORE binding (``:1455-1457``)
      so circular-convolution binding operates on unit vectors
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    key = key if key is not None else jax.random.PRNGKey(0)
    z_all, labels = handle.collect_flat_z(x, y, key, limit=400)
    labels = np.asarray(labels)
    ia = np.where(labels == class_a)[0]
    ib = np.where(labels == class_b)[0]
    if not len(ia) or not len(ib):
        return {"plot_path": None,
                "cross_class_bind_unbind_similarity": 0.0,
                "cross_class_bind_unbind_plot_path": None}
    za, zb = z_all[int(ia[0])], z_all[int(ib[0])]
    if getattr(handle, "distribution", None) == "gaussian":
        za = za / jnp.maximum(jnp.linalg.norm(za), 1e-12)
        zb = zb / jnp.maximum(jnp.linalg.norm(zb), 1e-12)
    bound = bind(za, zb)
    bundle = (za + zb) / np.sqrt(2.0)

    sims = {}
    recs = {}
    for method in ["*", "†"]:
        rec_a = unbind(bound, zb, method=method)
        rec_b = unbind(bound, za, method=method)
        sims[f"sim_a_{method}"] = float(similarity(rec_a, za))
        sims[f"sim_b_{method}"] = float(similarity(rec_b, zb))
        recs[method] = (rec_a, rec_b)
    sim_star = 0.5 * (sims["sim_a_*"] + sims["sim_b_*"])
    sim_dag = 0.5 * (sims["sim_a_†"] + sims["sim_b_†"])

    from cliffordtpu.eval.plots import to_image

    # decode order mirrors the reference ``torch.cat`` (:1489):
    # a, b, bind, bundle, rec_a*, rec_b*, rec_a dagger, rec_b dagger
    flat = jnp.stack([za, zb, bound, bundle,
                      recs["*"][0], recs["*"][1],
                      recs["†"][0], recs["†"][1]], 0)
    imgs = np.asarray(to_image(handle, handle.decode(flat)))
    imgs = imgs.reshape(-1, *img_shape)
    ih, iw = imgs.shape[1], imgs.shape[2]

    def _cname(c):
        return (class_names[c] if class_names and c < len(class_names)
                else str(c))

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(
        output_dir, f"cross_class_bind_unbind_{class_a}v{class_b}.png")
    fig, axes = plt.subplots(2, 4, figsize=(12, 6))
    titles = [
        f"A (cls {_cname(class_a)})", f"B (cls {_cname(class_b)})",
        "decode bind(A,B)", "decode bundle(A,B)",
        f"rec A (* {sim_star:.3f})", f"rec B (* {sim_star:.3f})",
        f"rec A († {sim_dag:.3f})", f"rec B († {sim_dag:.3f})",
    ]
    for k in range(8):
        ax = axes[k // 4][k % 4]
        if imgs.shape[-1] == 1:
            ax.imshow(imgs[k][..., 0], cmap="gray")
        else:
            ax.imshow(np.clip(imgs[k], 0, 1))
        ax.set_title(titles[k], fontsize=9)
        ax.axis("off")
    fig.suptitle(f"Cross-Class Bind/Unbind ({handle.distribution})",
                 fontsize=12, fontweight="bold")
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()

    return {
        "plot_path": path,
        "cross_class_bind_unbind_similarity": 0.5 * (sim_star + sim_dag),
        "cross_class_bind_unbind_similarity_star": sim_star,
        "cross_class_bind_unbind_similarity_dag": sim_dag,
        "cross_class_bind_unbind_plot_path": path,
        **sims,
    }


# reference-parity names, not pytest tests
test_self_binding.__test__ = False
test_vsa_operations.__test__ = False
test_pairwise_bind_bundle_decode.__test__ = False
test_cross_class_bind_unbind.__test__ = False
