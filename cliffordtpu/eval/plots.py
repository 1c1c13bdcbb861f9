"""Visualization suite — rebuild of the plotting half of
``utils/wandb_utils.py`` plus the runner-level plot helpers
(``mnist/mnist_clifpws.py:84-174``, ``cnn/fashion_train.py:180-380``).

Filenames match the reference so artifact consumers are unchanged.  One
deliberate deviation: image post-processing uses the decoder's actual output
activation (sigmoid for the BCE MLP decoder, [-1,1]->[0,1] for tanh CNN
decoders) instead of the reference's blanket ``x*0.5+0.5`` on logits
(``wandb_utils.py:246-252``), which renders MLP logits unviewably.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.ops.torus import angles_to_torus, torus_to_angles, wrap_angle


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def to_image(handle, x_recon):
    """Map decoder output to [0,1] using the model family's activation."""
    act = "sigmoid" if type(handle.model).__name__ == "MLPVAE" else "tanh"
    if act == "sigmoid":
        return jax.nn.sigmoid(x_recon)
    return jnp.clip(x_recon * 0.5 + 0.5, 0, 1)


def _grid(imgs: np.ndarray, n_cols: int, pad: float = 0.5) -> np.ndarray:
    """Tile (N, H, W, C) into a padded grid image (like torchvision
    make_grid with pad_value)."""
    n, h, w, c = imgs.shape
    n_rows = (n + n_cols - 1) // n_cols
    canvas = np.full(((h + 2) * n_rows, (w + 2) * n_cols, c), pad,
                     dtype=np.float32)
    for i in range(n):
        r, cc = divmod(i, n_cols)
        canvas[r * (h + 2) + 1:r * (h + 2) + 1 + h,
               cc * (w + 2) + 1:cc * (w + 2) + 1 + w] = imgs[i]
    return canvas


def _imshow_save(canvas, path, title, figsize):
    plt = _plt()
    plt.figure(figsize=figsize)
    if canvas.shape[-1] == 1:
        plt.imshow(canvas[..., 0], cmap="gray")
    else:
        plt.imshow(canvas)
    plt.title(title)
    plt.axis("off")
    plt.savefig(path, dpi=200, bbox_inches="tight")
    plt.close()
    return path


def plot_reconstructions(handle, x, filepath, img_shape=(28, 28, 1),
                         key=None):
    """Top originals / bottom recons (``mnist_clifpws.py:84-104``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    xb = jnp.asarray(x[:8])
    m = handle.model
    if type(m).__name__ == "MLPVAE":
        out = m.apply({"params": handle.params},
                      xb.reshape(8, -1), rngs={"sample": key})
        recon = out[-1]
        origs = np.asarray(xb).reshape(8, *img_shape)
    else:
        recon, _, _, _ = m.apply({"params": handle.params}, xb,
                                 rngs={"sample": key})
        origs = np.asarray(jnp.clip(xb * 0.5 + 0.5, 0, 1))
    recons = np.asarray(to_image(handle, recon)).reshape(8, *img_shape)
    canvas = _grid(np.concatenate([origs.reshape(8, *img_shape), recons], 0), 8)
    return _imshow_save(
        canvas, filepath,
        "Top: Original Images | Bottom: Reconstructed Images", (10, 3))


def plot_interpolations(handle, x, y, filepath, steps: int = 10,
                        img_shape=(28, 28, 1), key=None):
    """Two-image latent interpolation (``mnist_clifpws.py:106-156``).

    Clifford path uses angle interpolation with wraparound and the
    reference's norm="ortho" iFFT (vectors scaled by sqrt(2d) vs training
    latents — a reference quirk kept for parity)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    y = np.asarray(y)
    idx1 = int(np.argmax(y == y[0]))
    idx2 = int(np.argmax(y != y[0]))
    x1, x2 = jnp.asarray(x[idx1:idx1 + 1]), jnp.asarray(x[idx2:idx2 + 1])
    m = handle.model
    z1 = handle.latent_mu(x1, key)
    z2 = handle.latent_mu(x2, jax.random.fold_in(key, 1))
    alphas = jnp.linspace(0, 1, steps)[:, None]
    dist = handle.distribution

    if dist == "clifford":
        delta = (z2 - z1 + math.pi) % (2 * math.pi) - math.pi
        interp_angles = z1 + alphas * delta
        d = interp_angles.shape[-1]
        interp_z = angles_to_torus(interp_angles) * math.sqrt(2 * d)
    elif dist in ("powerspherical", "vmf"):
        z = (1 - alphas) * z1 + alphas * z2
        interp_z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True),
                                min=1e-12)
    else:
        interp_z = (1 - alphas) * z1 + alphas * z2

    imgs = np.asarray(to_image(handle, handle.decode(interp_z)))
    imgs = imgs.reshape(-1, *img_shape)
    canvas = _grid(imgs, steps)
    return _imshow_save(
        canvas, filepath,
        f"Latent Space Interpolation ({dist.upper()}-VAE)", (12, 2))


def plot_latent_space(handle, x, y, filepath, n_plot: int = 1000, key=None):
    """t-SNE of posterior means (``mnist_clifpws.py:159-174``),
    random_state=42 like the reference."""
    from sklearn.manifold import TSNE

    key = key if key is not None else jax.random.PRNGKey(0)
    Xz = np.asarray(handle.latent_mu(x[:n_plot], key))
    yy = np.asarray(y[:n_plot])
    print(f"running t-sne on {len(Xz)} points...")
    perplexity = min(30, max(2, len(Xz) // 4))
    tsne = TSNE(n_components=2, random_state=42, perplexity=perplexity,
                max_iter=1000)
    z2 = tsne.fit_transform(Xz)
    plt = _plt()
    plt.figure(figsize=(8, 6))
    plt.scatter(z2[:, 0], z2[:, 1], c=yy, cmap=plt.get_cmap("tab10", 10),
                s=10, alpha=0.8)
    plt.title(f"t-SNE Latent Space ({handle.distribution.upper()}-VAE)")
    plt.xticks([])
    plt.yticks([])
    plt.savefig(filepath, dpi=200, bbox_inches="tight")
    plt.close()
    return filepath


def plot_multi_perplexity_tsne(handle, x, y, save_dir,
                               perplexities=(5, 30, 50), n_plot=1000,
                               key=None):
    """Multi-perplexity t-SNE panel (``fashion_train.py:384-443``)."""
    from sklearn.manifold import TSNE

    key = key if key is not None else jax.random.PRNGKey(0)
    Xz = np.asarray(handle.latent_mu(x[:n_plot], key))
    yy = np.asarray(y[:n_plot])
    plt = _plt()
    fig, axes = plt.subplots(1, len(perplexities),
                             figsize=(5 * len(perplexities), 5))
    if len(perplexities) == 1:
        axes = [axes]
    for ax, perp in zip(axes, perplexities):
        p = min(perp, max(2, len(Xz) // 4))
        z2 = TSNE(n_components=2, random_state=42, perplexity=p,
                  max_iter=1000).fit_transform(Xz)
        sc = ax.scatter(z2[:, 0], z2[:, 1], c=yy,
                        cmap=plt.get_cmap("tab10", 10), s=8, alpha=0.8)
        ax.set_title(f"perplexity={perp}")
        ax.set_xticks([])
        ax.set_yticks([])
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "tsne_multi_perplexity.png")
    plt.tight_layout()
    plt.savefig(path, dpi=200, bbox_inches="tight")
    plt.close()
    return path


def plot_clifford_torus_latent_scatter(handle, x, y, output_dir,
                                       dims=(0, 1), dataset_name=None,
                                       key=None):
    """Phase-angle scatter (``wandb_utils.py:459-503``)."""
    if handle.distribution != "clifford" or handle.latent_dim < 2:
        return None
    key = key if key is not None else jax.random.PRNGKey(0)
    mu = handle.latent_mu(x[:4000], key)
    A = np.asarray(wrap_angle(mu))
    Y = np.asarray(y[:4000])
    ax0, ax1 = dims
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(
        output_dir,
        f"clifford_torus_latent_scatter_{dataset_name or 'dataset'}.png")
    plt = _plt()
    plt.figure(figsize=(5, 5))
    sc = plt.scatter(A[:, ax0], A[:, ax1], c=Y, cmap="tab10", s=6, alpha=0.8)
    plt.colorbar(sc)
    plt.xlim(-math.pi, math.pi)
    plt.ylim(-math.pi, math.pi)
    plt.xlabel(f"Phase Angle $\\theta_{{{ax0}}}$")
    plt.ylabel(f"Phase Angle $\\theta_{{{ax1}}}$")
    plt.title("Clifford Torus Latent Phase Angles")
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    return path


def plot_clifford_manifold_visualization(handle, output_dir, n_grid=12,
                                         dims=(0, 1), img_shape=(28, 28, 1)):
    """Decode a 2-D grid of torus angles (``wandb_utils.py:660-731``)."""
    if handle.distribution != "clifford" or handle.latent_dim < 2:
        return None
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "clifford_manifold_visualization.png")
    d = handle.latent_dim
    a0 = np.linspace(-math.pi, math.pi, n_grid)
    m0, m1 = np.meshgrid(a0, a0, indexing="ij")
    A = np.zeros((n_grid * n_grid, d), np.float32)
    A[:, dims[0]] = m0.ravel()
    A[:, dims[1]] = m1.ravel()
    Z = angles_to_torus(jnp.asarray(A))
    if handle.num_tokens:
        Z = jnp.tile(Z, (1, handle.num_tokens))
    imgs = np.asarray(to_image(handle, handle.decode(Z)))
    imgs = imgs.reshape(-1, *img_shape)
    h, w, c = img_shape
    canvas = np.zeros((n_grid * h, n_grid * w, c), np.float32)
    for i in range(n_grid):
        for j in range(n_grid):
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = imgs[i * n_grid + j]
    return _imshow_save(
        canvas, path,
        f"Clifford Torus Manifold Traversal (Dimensions {dims[0]}, {dims[1]})",
        (8, 8))


def plot_clifford_torus_recon_grid(handle, output_dir, dims=(0, 1),
                                   n_grid: int = 16, img_shape=(28, 28, 1)):
    """``wandb_utils.py:524-564`` — same as the manifold grid, legacy name."""
    if handle.distribution != "clifford" or handle.latent_dim < 2:
        return None
    os.makedirs(output_dir, exist_ok=True)
    p = plot_clifford_manifold_visualization(
        handle, output_dir, n_grid=n_grid, dims=dims, img_shape=img_shape)
    if p is None:
        return None
    out = os.path.join(output_dir, "clifford_torus_recon_grid.png")
    try:
        import shutil

        shutil.copyfile(p, out)
    except OSError:
        return p
    return out


def plot_prior_sample_grid(handle, output_dir, n_samples=64,
                           img_shape=(28, 28, 1), key=None,
                           filename="prior_samples.png"):
    """Random prior decodes (``wandb_utils.py:733-845`` PS/gaussian grids)."""
    from cliffordtpu.eval.prior import sample_prior_z

    key = key if key is not None else jax.random.PRNGKey(0)
    z = sample_prior_z(key, handle.distribution, handle.latent_dim,
                       n_samples,
                       l2_normalize=getattr(handle.model, "l2_normalize",
                                            False),
                       num_tokens=handle.num_tokens)
    imgs = np.asarray(to_image(handle, handle.decode(z)))
    imgs = imgs.reshape(-1, *img_shape)
    canvas = _grid(imgs, int(math.isqrt(n_samples)))
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, filename)
    return _imshow_save(
        canvas, path,
        f"Prior Samples ({handle.distribution.upper()})", (8, 8))


def plot_latent_dimension_exploration(handle, x, output_dir,
                                      n_dims_to_explore: int = 6,
                                      n_steps: int = 9,
                                      img_shape=(28, 28, 1), key=None):
    """Per-dimension latent traversal (``wandb_utils.py:1137-1250``):
    clifford varies angles in [-pi, pi], others in [-3, 3]; dims spread
    evenly when latent_dim > 10; file ``{dist}_style_exploration.png``."""
    latent_dim = handle.latent_dim
    dist = handle.distribution
    if latent_dim is None or latent_dim < 4:
        return None
    key = key if key is not None else jax.random.PRNGKey(0)
    mu = handle.latent_mu(jnp.asarray(x[:1]), key)

    dims_to_explore = min(n_dims_to_explore, latent_dim)
    if latent_dim > 10:
        dim_indices = [int(i * latent_dim / dims_to_explore)
                       for i in range(dims_to_explore)]
    else:
        dim_indices = list(range(dims_to_explore))
    if dist == "clifford":
        sweep = np.linspace(-math.pi, math.pi, n_steps)
    else:
        sweep = np.linspace(-3.0, 3.0, n_steps)

    rows = []
    for dim_idx in dim_indices:
        z = jnp.repeat(mu[:, : latent_dim * (handle.num_tokens or 1)]
                       if handle.num_tokens else mu, n_steps, axis=0)
        z = z.at[:, dim_idx].set(jnp.asarray(sweep, z.dtype))
        if dist == "clifford":
            if handle.num_tokens:
                T, D = handle.num_tokens, latent_dim
                lat = angles_to_torus(z.reshape(n_steps, T, D)).reshape(
                    n_steps, -1)
            else:
                lat = angles_to_torus(z)
        else:
            lat = z
        rows.append(lat)
    lats = jnp.concatenate(rows, 0)
    imgs = np.asarray(to_image(handle, handle.decode(lats)))
    imgs = imgs.reshape(-1, *img_shape)
    h, w, c = img_shape
    n_rows = len(dim_indices)
    canvas = np.zeros((n_rows * h, n_steps * w, c), np.float32)
    for i in range(n_rows):
        for j in range(n_steps):
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = \
                imgs[i * n_steps + j]

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{dist}_style_exploration.png")
    plt = _plt()
    fig_h = max(8, n_rows * 1.5)
    fig_w = max(12, n_steps * 1.5)
    plt.figure(figsize=(fig_w, fig_h))
    if c == 1:
        plt.imshow(canvas[..., 0], cmap="gray")
    else:
        plt.imshow(canvas)
    plt.yticks([h * i + h // 2 for i in range(n_rows)],
               [f"Dim {dim_indices[i]}" for i in range(n_rows)])
    range_str = "[-π, π]" if dist == "clifford" else "[-3σ, 3σ]"
    plt.xticks([w * i + w // 2 for i in range(n_steps)],
               [f"{sweep[i]:.2f}" for i in range(n_steps)], rotation=45)
    plt.title(
        f"{dist.capitalize()} Latent Space Traversal ($d={latent_dim}$)\n"
        f"Each Row Shows Variations Along One Latent Dimension {range_str}")
    plt.tight_layout()
    plt.savefig(path, dpi=300, bbox_inches="tight")
    plt.close()
    return path


# legacy name kept for callers
plot_latent_traversal = plot_latent_dimension_exploration


# ---- interpolation helpers (``fashion_train.py:183-380``) ----


def slerp(z1, z2, t):
    z1n = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    z2n = z2 / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    dot = jnp.clip(jnp.sum(z1n * z2n, -1, keepdims=True), -1, 1)
    omega = jnp.arccos(dot)
    sin_o = jnp.sin(omega)
    lin = (1 - t) * z1n + t * z2n
    s1 = jnp.sin((1 - t) * omega) / sin_o
    s2 = jnp.sin(t * omega) / sin_o
    return jnp.where(jnp.abs(sin_o) < 1e-6, lin, s1 * z1n + s2 * z2n)


def lerp(z1, z2, t):
    return (1 - t) * z1 + t * z2


def clifford_manifold_interp(z1, z2, t, latent_dim: int):
    """Angle-space interpolation with wraparound
    (``fashion_train.py:202-220``)."""
    a1 = torus_to_angles(z1)[..., :latent_dim]
    a2 = torus_to_angles(z2)[..., :latent_dim]
    diff = wrap_angle(a2 - a1)
    ai = a1 + t * diff
    return angles_to_torus(ai)


def get_fixed_interp_pairs(x, y, n_pairs: int = 5, seed: int = 42):
    """Fixed seeded class pairs (``fashion_train.py:223-251``)."""
    rng = np.random.RandomState(seed)
    y = np.asarray(y)
    class_images = {}
    for i in range(len(y)):
        label = int(y[i])
        if label not in class_images:
            class_images[label] = np.asarray(x[i])
        if len(class_images) >= 10:
            break
    classes = sorted(class_images.keys())
    pairs, used = [], set()
    for _ in range(n_pairs * 10):
        c1, c2 = rng.choice(classes, 2, replace=False)
        kk = (min(c1, c2), max(c1, c2))
        if kk not in used:
            used.add(kk)
            pairs.append((class_images[c1], class_images[c2], int(c1),
                          int(c2)))
        if len(pairs) >= n_pairs:
            break
    return pairs


def plot_latent_interpolations(handle, fixed_pairs, save_dir,
                               n_steps: int = 10, img_shape=(32, 32, 1),
                               key=None):
    """slerp / lerp / clifford-manifold interpolation rows per pair
    (``fashion_train.py:253-380``)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dist = handle.distribution
    os.makedirs(save_dir, exist_ok=True)
    paths = []
    methods = (["slerp", "manifold"] if dist == "clifford"
               else ["slerp"] if dist == "powerspherical" else ["lerp"])
    for method in methods:
        rows = []
        for p_i, (img1, img2, c1, c2) in enumerate(fixed_pairs):
            xb = jnp.stack([jnp.asarray(img1), jnp.asarray(img2)], 0)
            z = handle.flat_z(xb, jax.random.fold_in(key, p_i))
            z1, z2 = z[0:1], z[1:2]
            ts = jnp.linspace(0, 1, n_steps)[:, None]
            if method == "manifold":
                T = handle.num_tokens
                D = handle.latent_dim
                if T:
                    zz1 = z1.reshape(1, T, 2 * D)
                    zz2 = z2.reshape(1, T, 2 * D)
                    zi = jnp.concatenate([
                        clifford_manifold_interp(zz1, zz2, float(t), D)
                        .reshape(1, -1) for t in ts[:, 0]], 0)
                else:
                    zi = jnp.concatenate([
                        clifford_manifold_interp(z1, z2, float(t), D)
                        for t in ts[:, 0]], 0)
            elif method == "slerp":
                zi = jnp.concatenate(
                    [slerp(z1, z2, float(t)) for t in ts[:, 0]], 0)
            else:
                zi = jnp.concatenate(
                    [lerp(z1, z2, float(t)) for t in ts[:, 0]], 0)
            rows.append(np.asarray(to_image(handle, handle.decode(zi))))
        imgs = np.concatenate(rows, 0).reshape(-1, *img_shape)
        h, w, c = img_shape
        canvas = np.zeros((len(fixed_pairs) * h, n_steps * w, c), np.float32)
        for i in range(len(fixed_pairs)):
            for j in range(n_steps):
                canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = \
                    imgs[i * n_steps + j]
        path = os.path.join(save_dir, f"interpolation_{method}.png")
        _imshow_save(canvas, path,
                     f"Latent Interpolation ({method}, {dist})",
                     (n_steps, len(fixed_pairs)))
        paths.append(path)
    return paths


def plot_powerspherical_manifold_visualization(handle, output_dir,
                                               n_samples=256, dims=(0, 1),
                                               img_shape=(28, 28, 1),
                                               key=None):
    """Random unit-sphere decodes on a 12x12 grid
    (``wandb_utils.py:733-789``)."""
    if handle.distribution != "powerspherical" or handle.latent_dim < 2:
        return None
    key = key if key is not None else jax.random.PRNGKey(0)
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "powerspherical_manifold_visualization.png")
    g = 12
    z = jax.random.normal(key, (g * g, handle.latent_dim))
    z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True), min=1e-12)
    if handle.num_tokens:
        z = jnp.tile(z, (1, handle.num_tokens))
    imgs = np.asarray(to_image(handle, handle.decode(z))).reshape(
        -1, *img_shape)
    h, w, c = img_shape
    canvas = np.zeros((g * h, g * w, c), np.float32)
    for i in range(g):
        for j in range(g):
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = imgs[i * g + j]
    return _imshow_save(canvas, path,
                        "Power Spherical Manifold Reconstructions", (8, 8))


def plot_gaussian_manifold_visualization(handle, output_dir, n_samples=144,
                                         dims=(0, 1), img_shape=(28, 28, 1),
                                         key=None):
    """Random N(0,I) decodes on a 12x12 grid (``wandb_utils.py:791-845``)."""
    if handle.distribution not in ("gaussian", "normal") or \
            handle.latent_dim < 2:
        return None
    key = key if key is not None else jax.random.PRNGKey(0)
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "gaussian_manifold_visualization.png")
    g = 12
    z = jax.random.normal(key, (g * g, handle.latent_dim))
    if handle.num_tokens:
        z = jnp.tile(z, (1, handle.num_tokens))
    imgs = np.asarray(to_image(handle, handle.decode(z))).reshape(
        -1, *img_shape)
    h, w, c = img_shape
    canvas = np.zeros((g * h, g * w, c), np.float32)
    for i in range(g):
        for j in range(g):
            canvas[i * h:(i + 1) * h, j * w:(j + 1) * w] = imgs[i * g + j]
    return _imshow_save(
        canvas, path,
        "Gaussian Manifold Random Sample Reconstructions", (8, 8))


def plot_decoded_bundles(handle, x, y, save_path, class_names=None,
                         n_samples=500, max_bundle_size=5, key=None):
    """Bundle class-prototype latents and decode (``fashion_train.py:446-518``).

    Rows = bundle size k in 2..max; 3 seeded class combos per row
    (RandomState(42), matching the reference)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    plt = _plt()
    all_z, all_labels = [], []
    n = 0
    for s in range(0, min(len(x), n_samples * 2), 200):
        z = handle.flat_z(x[s:s + 200], jax.random.fold_in(key, s))
        all_z.append(z)
        all_labels.append(np.asarray(y[s:s + 200]))
        n += z.shape[0]
        if n >= n_samples:
            break
    all_z = jnp.concatenate(all_z, 0)[:n_samples]
    all_labels = np.concatenate(all_labels, 0)[:n_samples]

    unique_classes = sorted(np.unique(all_labels).tolist())
    class_means = {
        c: all_z[np.where(all_labels == c)[0]].mean(0)
        for c in unique_classes
    }
    bundle_sizes = list(range(2, min(max_bundle_size + 1,
                                     len(unique_classes) + 1)))
    n_combos = 3
    rng = np.random.RandomState(42)

    fig, axes = plt.subplots(len(bundle_sizes), n_combos,
                             figsize=(3 * n_combos, 3 * len(bundle_sizes)))
    axes = np.atleast_2d(axes)
    for row, k in enumerate(bundle_sizes):
        for col in range(n_combos):
            chosen = rng.choice(unique_classes, size=k,
                                replace=False).tolist()
            bundle_vec = sum(class_means[c] for c in chosen)
            decoded = to_image(handle, handle.decode(bundle_vec[None]))
            img = np.asarray(decoded)[0]
            if img.ndim == 1:
                side = int(math.isqrt(img.shape[0]))
                img = img.reshape(side, side, 1)
            if img.shape[-1] == 1:
                axes[row, col].imshow(img[..., 0], cmap="gray")
            else:
                axes[row, col].imshow(img)
            names = [class_names[c] if class_names else str(c)
                     for c in chosen]
            axes[row, col].set_title("+".join(names), fontsize=8)
            axes[row, col].axis("off")
    plt.suptitle("Decoded Class-Prototype Bundles")
    plt.tight_layout()
    plt.savefig(save_path, dpi=200, bbox_inches="tight")
    plt.close()
    return save_path
