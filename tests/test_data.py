"""Dataset loader tests: synthetic fallback, transforms, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.data import (
    binarize_with_random_threshold,
    iterate_batches,
    load_dataset,
)

KEY = jax.random.PRNGKey(0)


def test_mnist_shapes_and_range():
    ds = load_dataset("mnist", n_train=64, n_test=32)
    assert ds["x_train"].shape == (64, 28, 28, 1)
    assert ds["x_test"].shape == (32, 28, 28, 1)
    assert 0.0 <= ds["x_train"].min() and ds["x_train"].max() <= 1.0
    assert set(np.unique(ds["y_train"])) <= set(range(10))


def test_fashion_and_cifar_pm1():
    for name, ch in [("fashionmnist", 1), ("cifar10", 3)]:
        ds = load_dataset(name, n_train=16, n_test=8)
        assert ds["x_train"].shape == (16, 32, 32, ch)
        assert ds["x_train"].min() >= -1.0 - 1e-6
        assert ds["x_train"].max() <= 1.0 + 1e-6


def test_mnist32_real_shard_at_cnn_geometry(monkeypatch):
    """mnist32 serves the SAME digit files at the CNN runners' geometry
    (32px bilinear, [-1,1]) so the committed real shard can train the
    CNN/ViT/Hybrid families."""
    import os

    shard = os.path.join(os.path.dirname(__file__), "data")
    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", shard)
    ds = load_dataset("mnist32", n_train=32, n_test=16)
    assert ds["source"] == "real"
    assert ds["x_train"].shape == (32, 32, 32, 1)
    assert ds["x_train"].min() >= -1.0 - 1e-6
    assert ds["x_train"].max() <= 1.0 + 1e-6
    # same underlying digits as the 28px mnist view of the shard
    ref = load_dataset("mnist", n_train=32)
    np.testing.assert_array_equal(ds["y_train"], ref["y_train"])


def test_mnist32_synthetic_fallback():
    ds = load_dataset("mnist32", n_train=16, n_test=8)
    assert ds["x_train"].shape == (16, 32, 32, 1)
    assert ds["x_train"].min() >= -1.0 - 1e-6
    # the synthetic digits come from the mnist generator (shared alias)
    ref = load_dataset("mnist", n_train=16, n_test=8)
    np.testing.assert_array_equal(ds["y_train"], ref["y_train"])


def test_synthetic_deterministic():
    a = load_dataset("mnist", n_train=32, n_test=8)
    b = load_dataset("mnist", n_train=32, n_test=8)
    np.testing.assert_array_equal(a["x_train"], b["x_train"])
    np.testing.assert_array_equal(a["y_train"], b["y_train"])


def test_synthetic_classes_distinguishable():
    """The glyph fallback must be class-separable enough for eval sanity:
    nearest-centroid in pixel space beats chance comfortably."""
    ds = load_dataset("mnist", n_train=400, n_test=100)
    x = ds["x_train"].reshape(400, -1)
    y = ds["y_train"]
    cents = np.stack([x[y == c].mean(0) for c in range(10)])
    xt = ds["x_test"].reshape(100, -1)
    preds = np.argmin(
        ((xt[:, None, :] - cents[None]) ** 2).sum(-1), axis=1)
    assert (preds == ds["y_test"]).mean() > 0.3


def test_binarize():
    x = jnp.full((4, 10), 0.5)
    b = binarize_with_random_threshold(KEY, x)
    assert set(np.unique(np.asarray(b))) <= {0.0, 1.0}
    # extreme values are deterministic
    np.testing.assert_array_equal(
        np.asarray(binarize_with_random_threshold(KEY, jnp.ones((3, 3)))),
        np.ones((3, 3)))


def test_iterate_batches():
    x = np.arange(10)[:, None].astype(np.float32)
    y = np.arange(10)
    batches = list(iterate_batches(x, y, 4))
    assert [b[0].shape[0] for b in batches] == [4, 4, 2]
    batches = list(iterate_batches(x, y, 4, drop_remainder=True))
    assert [b[0].shape[0] for b in batches] == [4, 4]
    # keyed shuffle covers all elements exactly once
    xs = np.concatenate(
        [b[0] for b in iterate_batches(x, y, 3, key=KEY)]).ravel()
    assert sorted(xs.tolist()) == list(range(10))


def test_idx_ingestion(tmp_path, monkeypatch):
    """Real idx files (raw and .gz) load byte-exact (ROADMAP item 1)."""
    import gzip
    import struct

    d = tmp_path / "mnist"
    d.mkdir()
    rng = np.random.default_rng(0)
    xtr = rng.integers(0, 256, (30, 28, 28), dtype=np.uint8)
    ytr = rng.integers(0, 10, 30).astype(np.uint8)
    xte = rng.integers(0, 256, (10, 28, 28), dtype=np.uint8)
    yte = rng.integers(0, 10, 10).astype(np.uint8)

    def hdr_img(a):
        return struct.pack(">HBB", 0, 8, 3) + struct.pack(">III", *a.shape)

    def hdr_lbl(a):
        return struct.pack(">HBB", 0, 8, 1) + struct.pack(">I", a.shape[0])

    (d / "train-images-idx3-ubyte").write_bytes(hdr_img(xtr) + xtr.tobytes())
    (d / "train-labels-idx1-ubyte").write_bytes(hdr_lbl(ytr) + ytr.tobytes())
    with gzip.open(d / "t10k-images-idx3-ubyte.gz", "wb") as f:
        f.write(hdr_img(xte) + xte.tobytes())
    with gzip.open(d / "t10k-labels-idx1-ubyte.gz", "wb") as f:
        f.write(hdr_lbl(yte) + yte.tobytes())

    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", str(tmp_path))
    ds = load_dataset("mnist")
    assert ds["source"] == "real"
    np.testing.assert_allclose(ds["x_train"][..., 0], xtr / 255.0, atol=1e-6)
    np.testing.assert_array_equal(ds["y_train"], ytr)
    np.testing.assert_allclose(ds["x_test"][..., 0], xte / 255.0, atol=1e-6)
    np.testing.assert_array_equal(ds["y_test"], yte)


def _idx_img_bytes(a):
    import struct

    return (struct.pack(">HBB", 0, 8, a.ndim)
            + struct.pack(">" + "I" * a.ndim, *a.shape) + a.tobytes())


def test_fashion_idx_ingestion_torchvision_layout(tmp_path, monkeypatch):
    """FashionMNIST idx files under torchvision's FashionMNIST/raw layout
    load for real, with the reference's 28->32 resize + [-1,1] normalize
    (``cnn/fashion_train.py:712-716``)."""
    import gzip

    d = tmp_path / "FashionMNIST" / "raw"
    d.mkdir(parents=True)
    rng = np.random.default_rng(1)
    xtr = rng.integers(0, 256, (20, 28, 28), dtype=np.uint8)
    ytr = rng.integers(0, 10, 20).astype(np.uint8)
    xte = rng.integers(0, 256, (8, 28, 28), dtype=np.uint8)
    yte = rng.integers(0, 10, 8).astype(np.uint8)
    for name, arr in [("train-images-idx3-ubyte", xtr),
                      ("t10k-images-idx3-ubyte", xte)]:
        with gzip.open(d / f"{name}.gz", "wb") as f:
            f.write(_idx_img_bytes(arr))
    for name, arr in [("train-labels-idx1-ubyte", ytr),
                      ("t10k-labels-idx1-ubyte", yte)]:
        (d / name).write_bytes(_idx_img_bytes(arr))

    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", str(tmp_path))
    ds = load_dataset("fashionmnist")
    assert ds["source"] == "real"
    assert ds["x_train"].shape == (20, 32, 32, 1)
    expected = np.asarray(jax.image.resize(
        jnp.asarray(xtr[..., None] / 255.0, jnp.float32),
        (20, 32, 32, 1), method="bilinear")) * 2.0 - 1.0
    np.testing.assert_allclose(ds["x_train"], expected, atol=1e-6)
    np.testing.assert_array_equal(ds["y_test"], yte)
    assert ds["x_test"].min() >= -1.0 and ds["x_test"].max() <= 1.0


def test_npz_ingestion_per_dataset(tmp_path, monkeypatch):
    """The .npz escape hatch (the only real-data path for cifar10) loads
    byte-exact for every dataset."""
    shapes = {"mnist": (28, 28), "fashionmnist": (28, 28),
              "cifar10": (32, 32, 3)}
    rng = np.random.default_rng(2)
    monkeypatch.setenv("CLIFFORDTPU_DATA_DIR", str(tmp_path))
    for name, shp in shapes.items():
        d = tmp_path / name
        d.mkdir()
        xtr = rng.integers(0, 256, (12,) + shp, dtype=np.uint8)
        ytr = rng.integers(0, 10, 12).astype(np.int64)
        xte = rng.integers(0, 256, (6,) + shp, dtype=np.uint8)
        yte = rng.integers(0, 10, 6).astype(np.int64)
        np.savez(d / f"{name}.npz", x_train=xtr, y_train=ytr,
                 x_test=xte, y_test=yte)
        ds = load_dataset(name)
        assert ds["source"] == "real", name
        np.testing.assert_array_equal(ds["y_train"], ytr)
        if name == "cifar10":
            np.testing.assert_allclose(
                ds["x_test"], xte / 255.0 * 2.0 - 1.0, atol=1e-6)
        elif name == "mnist":
            np.testing.assert_allclose(
                ds["x_test"][..., 0], xte / 255.0, atol=1e-6)
        else:  # fashion: resized to 32 + pm1
            assert ds["x_test"].shape == (6, 32, 32, 1)
            assert ds["x_test"].min() >= -1.0 and ds["x_test"].max() <= 1.0
