#!/usr/bin/env python
"""Side-by-side pairwise bind/bundle figure from two trained checkpoints
(``scripts/paper_bind_bundle_figure.py:30-147``) — clifford vs gaussian.

Checkpoints are the orbax ``best_model.ckpt`` dirs written by the runners
with ``--keep_ckpts``."""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from cliffordtpu.data import load_dataset
from cliffordtpu.eval import ModelHandle
from cliffordtpu.eval.binding import test_pairwise_bind_bundle_decode
from cliffordtpu.nn import CNNVAE, HybridVAE
from cliffordtpu.train.checkpoint import load_checkpoint
from cliffordtpu.utils import CLASS_NAMES

FASHIONMNIST_CLASSES = CLASS_NAMES["fashionmnist"]
CIFAR_CLASSES = CLASS_NAMES["cifar10"]


def load_model(ckpt_dir, distribution, latent_dim, arch, dataset):
    in_ch = 3 if dataset == "cifar10" else 1
    if arch == "hybrid":
        model = HybridVAE(latent_dim=latent_dim, in_channels=in_ch,
                          distribution=distribution, img_size=32)
    elif arch == "cnn":
        model = CNNVAE(latent_dim=latent_dim, in_channels=in_ch,
                       distribution=distribution, img_size=32)
    else:
        raise ValueError(f"unsupported arch: {arch}")
    ckpt = load_checkpoint(ckpt_dir)
    if ckpt is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    return ModelHandle(model, ckpt["params"])


def run_pairwise(handle, x, y, class_names, img_shape):
    import matplotlib.image as mpimg

    with tempfile.TemporaryDirectory() as tmpdir:
        result = test_pairwise_bind_bundle_decode(
            handle, x, y, tmpdir, img_shape=img_shape,
            class_names=class_names, key=jax.random.PRNGKey(0))
        path = result.get("plot_path")
        avg_sim = result.get("avg_unbind_similarity", 0.0)
        if path and os.path.exists(path):
            return mpimg.imread(path), avg_sim
    return None, 0.0


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--clifford_ckpt", required=True)
    parser.add_argument("--gaussian_ckpt", required=True)
    parser.add_argument("--dataset", default="fashionmnist",
                        choices=["fashionmnist", "cifar10"])
    parser.add_argument("--latent_dim", type=int, default=256)
    parser.add_argument("--arch", default="cnn", choices=["cnn", "hybrid"])
    parser.add_argument("--output", default="bind_bundle_comparison.png")
    args = parser.parse_args()

    ds = load_dataset(args.dataset, n_test=500)
    class_names = (FASHIONMNIST_CLASSES if args.dataset == "fashionmnist"
                   else CIFAR_CLASSES)
    in_ch = 3 if args.dataset == "cifar10" else 1
    img_shape = (32, 32, in_ch)

    panels = []
    for label, ckpt, dist in [
        ("Clifford", args.clifford_ckpt, "clifford"),
        ("Gaussian", args.gaussian_ckpt, "gaussian"),
    ]:
        handle = load_model(ckpt, dist, args.latent_dim, args.arch,
                            args.dataset)
        img, sim = run_pairwise(handle, ds["x_test"], ds["y_test"],
                                class_names, img_shape)
        panels.append((label, img, sim))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(16, 10))
    for ax, (label, img, sim) in zip(axes, panels):
        if img is not None:
            ax.imshow(img)
        ax.set_title(f"{label} (avg unbind sim {sim:.3f})", fontsize=13)
        ax.axis("off")
    plt.suptitle("Pairwise Bind / Bundle / Unbind — Clifford vs Gaussian")
    plt.tight_layout()
    plt.savefig(args.output, dpi=300, bbox_inches="tight")
    plt.close()
    print(f"saved to {args.output}")


if __name__ == "__main__":
    main()
