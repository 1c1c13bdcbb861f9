"""Eval-battery smoke + property tests on a tiny trained-ish model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.data import load_dataset
from cliffordtpu.eval import ModelHandle
from cliffordtpu.eval.binding import (
    test_cross_class_bind_unbind,
    test_pairwise_bind_bundle_decode,
    test_self_binding,
    test_vsa_operations,
)
from cliffordtpu.eval.class_means import (
    compute_class_means,
    evaluate_mean_vector_cosine,
)
from cliffordtpu.eval.fid import compute_fid
from cliffordtpu.eval.knn import perform_knn_evaluation
from cliffordtpu.eval.prior import sample_prior_z
from cliffordtpu.nn import MLPVAE
from cliffordtpu.vsa.ops import normalize_vectors

KEY = jax.random.PRNGKey(3)


@pytest.fixture(scope="module")
def mnist_handle():
    ds = load_dataset("mnist", n_train=400, n_test=120)
    model = MLPVAE(h_dim=128, z_dim=10, distribution="clifford")
    x = jnp.zeros((2, 784))
    params = model.init({"params": KEY, "sample": KEY}, x)["params"]
    handle = ModelHandle(model, params)
    return handle, ds


def test_adapter_shapes(mnist_handle):
    handle, ds = mnist_handle
    x = ds["x_train"][:8]
    z = handle.flat_z(x, KEY)
    assert z.shape == (8, 20)  # clifford -> 2*z_dim
    mu = handle.latent_mu(x, KEY)
    assert mu.shape == (8, 10)
    imgs = handle.decode(z)
    assert imgs.shape == (8, 784)


def test_self_binding_runs(mnist_handle, tmp_path):
    handle, ds = mnist_handle
    res = test_self_binding(
        handle, ds["x_train"][:80], ds["y_train"][:80], str(tmp_path),
        k_self_bind=6, n_trials=3, key=KEY,
    )
    assert os.path.exists(res["similarity_after_k_binds_plot_path"])
    assert len(res["k_sims"]) == len(res["k_values"]) == 6
    # depth-1 unbind of a unit-ish latent should be near-perfect for torus
    assert res["k_sims"][0] > 0.5


def test_self_binding_depth_curve_matches_naive():
    """The scanned depth curve equals the reference's O(m^2) loop."""
    from cliffordtpu.eval.binding import _bind_unbind_depth_curve
    from cliffordtpu.vsa.ops import bind, similarity, unbind

    target = normalize_vectors(jax.random.normal(KEY, (32,)))
    partners = normalize_vectors(
        jax.random.normal(jax.random.fold_in(KEY, 1), (5, 32)))
    fast = np.asarray(_bind_unbind_depth_curve(target, partners, "inv"))
    slow = []
    for m in range(1, 6):
        bound = target
        for i in range(m):
            bound = bind(bound, partners[i])
        rec = bound
        for i in range(m - 1, -1, -1):
            rec = unbind(rec, partners[i], method="inv")
        slow.append(float(similarity(rec, target)))
    np.testing.assert_allclose(fast, slow, atol=1e-4)


def test_vsa_operations_runs(mnist_handle, tmp_path):
    handle, ds = mnist_handle
    res = test_vsa_operations(handle, ds["x_train"][:60], ds["y_train"][:60],
                              str(tmp_path), n_test_pairs=10, key=KEY)
    assert -1.0 <= res["vsa_bind_unbind_similarity"] <= 1.0
    assert os.path.exists(res["vsa_bind_unbind_plot"])


def test_pairwise_and_cross_class(mnist_handle, tmp_path):
    handle, ds = mnist_handle
    res = test_pairwise_bind_bundle_decode(
        handle, ds["x_train"][:100], ds["y_train"][:100], str(tmp_path),
        img_shape=(28, 28, 1), key=KEY)
    assert res["plot_path"] is None or os.path.exists(res["plot_path"])
    res2 = test_cross_class_bind_unbind(
        handle, ds["x_train"][:200], ds["y_train"][:200], str(tmp_path),
        class_a=int(ds["y_train"][0]), class_b=int(ds["y_train"][1]),
        img_shape=(28, 28, 1), key=KEY)
    assert "plot_path" in res2


def test_class_means_quirk(mnist_handle):
    handle, ds = mnist_handle
    means = compute_class_means(handle, ds["x_train"][:200],
                                ds["y_train"][:200], key=KEY)
    means_true = compute_class_means(handle, ds["x_train"][:200],
                                     ds["y_train"][:200], key=KEY,
                                     true_mean=True)
    # the min(count,10) divisor makes vectors larger when count > 10
    any_label = next(iter(means))
    n_label = int(np.sum(np.asarray(ds["y_train"][:200]) == any_label))
    if n_label > 10:
        assert (np.linalg.norm(np.asarray(means[any_label]))
                > np.linalg.norm(np.asarray(means_true[any_label])))
    acc, per_class = evaluate_mean_vector_cosine(
        handle, ds["x_test"][:100], ds["y_test"][:100], means, key=KEY)
    assert 0.0 <= acc <= 1.0
    assert len(per_class) == len(means)


def test_knn_eval(mnist_handle):
    handle, ds = mnist_handle
    res = perform_knn_evaluation(
        handle, ds["x_train"][:200], ds["y_train"][:200],
        ds["x_test"][:50], ds["y_test"][:50],
        n_samples_list=[100], key=KEY,
        rng=np.random.default_rng(0))
    assert "knn_acc_100" in res and "knn_f1_100" in res


def test_knn_jax_backend_close_to_sklearn(mnist_handle):
    handle, ds = mnist_handle
    kw = dict(
        handle=handle,
        x_train=ds["x_train"][:200], y_train=ds["y_train"][:200],
        x_test=ds["x_test"][:50], y_test=ds["y_test"][:50],
        n_samples_list=[100], key=KEY,
    )
    a = perform_knn_evaluation(backend="sklearn",
                               rng=np.random.default_rng(5), **kw)
    b = perform_knn_evaluation(backend="jax",
                               rng=np.random.default_rng(5), **kw)
    assert abs(a["knn_acc_100"] - b["knn_acc_100"]) < 0.12


def test_prior_sampling():
    z = sample_prior_z(KEY, "clifford", 8, 16)
    assert z.shape == (16, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-4)
    z = sample_prior_z(KEY, "powerspherical", 8, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), 1.0, atol=1e-4)
    z = sample_prior_z(KEY, "gaussian", 8, 4, num_tokens=3)
    assert z.shape == (4, 24)


def test_fid_sanity(mnist_handle):
    handle, ds = mnist_handle
    # FID(real, real-like) should be much smaller than FID(real, junk)
    from cliffordtpu.eval.fid import _frechet, _get_features

    real = np.clip(ds["x_train"][:64] * 0.5 + 0.5, 0, 1)
    real2 = np.clip(ds["x_train"][64:128] * 0.5 + 0.5, 0, 1)
    junk = np.random.default_rng(0).uniform(0, 1, real.shape).astype(
        np.float32)
    f1 = _get_features(real, "random_conv")
    f2 = _get_features(real2, "random_conv")
    f3 = _get_features(junk, "random_conv")

    def fd(a, b):
        return _frechet(a.mean(0), np.cov(a, rowvar=False),
                        b.mean(0), np.cov(b, rowvar=False))

    assert fd(f1, f2) < fd(f1, f3)


def test_compute_fid_runs(mnist_handle):
    handle, ds = mnist_handle
    res = compute_fid(handle, ds["x_test"][:64].reshape(-1, 28, 28, 1),
                      "clifford", 10, in_channels=1, n_samples=64,
                      batch_size=32, key=KEY)
    assert np.isfinite(res["fid"])
    assert res["fid_features"] == "random_conv"


def test_tables(tmp_path):
    from cliffordtpu.eval.tables import (
        plot_across_dims_comparison,
        plot_cross_dist_comparison_dim,
    )

    dim_results = {
        "clifford": {
            "bundle_cap": {"k": [2, 4], "accuracy": [1.0, 0.9]},
            "role_filler": {"k": [2, 4], "accuracy": [1.0, 0.8]},
            "self_binding_k_sims": [0.9, 0.8],
            "self_binding_k_values": [1, 2],
        },
        "random_hrr": {
            "bundle_cap": {"k": [2, 4], "accuracy": [0.9, 0.7]},
        },
    }
    p = plot_cross_dist_comparison_dim(dim_results, 128, "mnist",
                                       str(tmp_path))
    assert os.path.exists(p)

    across = {
        "clifford": {"dims": [2, 5], "knn_100": [0.5, 0.6],
                     "knn_600": [0.6, 0.7], "knn_1000": [0.7, 0.8],
                     "f1_100": [0.5, 0.6], "f1_600": [0.6, 0.7],
                     "f1_1000": [0.7, 0.8], "mean_cosine": [0.4, 0.5]},
        "powerspherical": {"dims": [2, 5], "knn_100": [0.4, 0.7],
                           "knn_600": [0.5, 0.75], "knn_1000": [0.6, 0.85],
                           "f1_100": [0.4, 0.62], "f1_600": [0.5, 0.72],
                           "f1_1000": [0.6, 0.82], "mean_cosine": [0.3, 0.6]},
    }
    tex = plot_across_dims_comparison(across, [2, 5], "mnist", str(tmp_path))
    assert os.path.exists(tex)
    content = open(tex).read()
    assert "\\textbf" in content and "booktabs" not in content
    assert os.path.exists(tmp_path / "mnist_results.csv")


def test_tables_across_dims_value_alignment(tmp_path):
    """Divergent dims x trials shapes per dist (sliced/truncated sweeps):
    the table must align by dim VALUE (positional alignment to the first
    dist's dims list misattributes values) and aggregate repeated trial
    entries to mean +- sample std."""
    from cliffordtpu.eval.tables import plot_across_dims_comparison

    def fam(dims, v):
        return {"dims": dims, "knn_100": v, "knn_600": v, "knn_1000": v,
                "f1_100": v, "f1_600": v, "f1_1000": v, "mean_cosine": v}

    across = {
        # two trials at d=2, one at d=5
        "clifford": fam([2, 2, 5], [0.5, 0.7, 0.9]),
        # d=5 ONLY — under positional alignment this 0.8 would land in
        # the d=2 row
        "gaussian": fam([5], [0.8]),
    }
    tex = plot_across_dims_comparison(across, [2, 5], "valign",
                                      str(tmp_path))
    assert "$\\pm$" in open(tex).read()  # multi-trial std rendered

    rows = {}
    for line in open(tmp_path / "valign_results.csv").read().splitlines():
        parts = line.split(",")
        rows[tuple(parts[:3])] = parts[3:]
    assert rows[("method", "metric", "n_train")] == ["d=2", "d=5"]
    # gaussian: empty at d=2, 0.8 at d=5 (value-keyed, not positional)
    g = rows[("Gaussian (L2)", "knn", "100")]
    assert g[0] == "" and abs(float(g[1]) - 0.8) < 1e-9
    # clifford d=2 aggregates the two trials to their mean
    c = rows[("Clifford", "knn", "100")]
    assert abs(float(c[0]) - 0.6) < 1e-9 and abs(float(c[1]) - 0.9) < 1e-9
    # the main CSV keeps the reference's one-row-per-metric schema: no
    # _std/_n rows may leak into it
    assert not any(k[1].endswith(("_std", "_n")) for k in rows)
    # std/n rows land in the sibling stats CSV for the multi-trial dist
    stats_rows = {}
    for line in (tmp_path / "valign_results_stats.csv").read_text() \
            .splitlines():
        parts = line.split(",")
        stats_rows[tuple(parts[:3])] = parts[3:]
    cs = stats_rows[("Clifford", "knn_std", "100")]
    # CSV prints 4 decimals
    assert abs(float(cs[0]) - np.std([0.5, 0.7], ddof=1)) < 1e-4
    assert stats_rows[("Clifford", "knn_n", "100")] == ["2", "1"]
    # single-trial dists emit no std/n rows anywhere
    assert ("Gaussian (L2)", "knn_std", "100") not in stats_rows
    assert ("Gaussian (L2)", "knn_std", "100") not in rows


def test_plots_smoke(mnist_handle, tmp_path):
    from cliffordtpu.eval import plots

    handle, ds = mnist_handle
    p1 = plots.plot_reconstructions(handle, ds["x_train"][:8],
                                    str(tmp_path / "recon.png"), key=KEY)
    assert os.path.exists(p1)
    p2 = plots.plot_interpolations(handle, ds["x_train"][:32],
                                   ds["y_train"][:32],
                                   str(tmp_path / "interp.png"), key=KEY)
    assert os.path.exists(p2)
    p3 = plots.plot_clifford_manifold_visualization(
        handle, str(tmp_path), n_grid=4)
    assert os.path.exists(p3)
    p4 = plots.plot_clifford_torus_latent_scatter(
        handle, ds["x_train"][:64], ds["y_train"][:64], str(tmp_path),
        dataset_name="mnist", key=KEY)
    assert os.path.exists(p4)
    p5 = plots.plot_prior_sample_grid(handle, str(tmp_path), n_samples=16,
                                      key=KEY)
    assert os.path.exists(p5)
    pairs = plots.get_fixed_interp_pairs(ds["x_train"][:100],
                                         ds["y_train"][:100], n_pairs=2)
    assert len(pairs) == 2
    # fashion-style interp needs image-shaped input; reshape mnist
    x_img = ds["x_train"][:100]
    pairs = plots.get_fixed_interp_pairs(x_img, ds["y_train"][:100],
                                         n_pairs=2)
    paths = plots.plot_latent_interpolations(
        handle, pairs, str(tmp_path), n_steps=4, img_shape=(28, 28, 1),
        key=KEY)
    for p in paths:
        assert os.path.exists(p)
