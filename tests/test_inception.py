"""InceptionV3 FID extractor: loading, primitives-parity vs torch, and the
label-matches-computation contract of ``compute_fid``.

Real Inception weights are unavailable here (zero egress), so structural
correctness is pinned three ways: the primitive ops (folded conv+BN+relu,
count_include_pad=False average pooling) are parity-tested against
torch.nn.functional; the full 94-conv graph must chain channel counts
exactly to the 2048-dim pool3 output; and the fid dispatch/labeling paths
are exercised with a random-weight npz.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.eval import inception as inc


def _random_npz(path, seed=0):
    """Variance-preserving random weights: He-scaled convs, identity-ish
    BN with relu gain, so input differences survive all 94 layers (tiny
    gammas make the net collapse to a constant, hiding wiring bugs)."""
    rng = np.random.RandomState(seed)
    arrs = {}
    for key, shape in inc.param_spec().items():
        if key.endswith("running_var"):
            arrs[key] = np.ones(shape, np.float32)
        elif key.endswith("running_mean"):
            arrs[key] = np.zeros(shape, np.float32)
        elif key.endswith("bn.weight"):
            arrs[key] = np.full(shape, 1.4, np.float32)
        elif key.endswith("bn.bias"):
            arrs[key] = (rng.randn(*shape) * 0.02).astype(np.float32)
        else:
            fan_in = int(np.prod(shape[1:]))
            arrs[key] = (rng.randn(*shape) / np.sqrt(fan_in)).astype(
                np.float32)
    np.savez(path, **arrs)
    return str(path)


def test_param_spec_shapes():
    spec = inc.param_spec()
    assert spec["Conv2d_1a_3x3.conv.weight"] == (32, 3, 3, 3)
    assert spec["Mixed_7c.branch_pool.conv.weight"] == (192, 2048, 1, 1)
    n_convs = sum(1 for k in spec if k.endswith("conv.weight"))
    assert n_convs == 94  # torchvision inception_v3 minus aux/fc
    # output channels of the last concat must total FEATURE_DIM
    last = [inc.CONV_DEFS[f"Mixed_7c.{b}"][1]
            for b in ("branch1x1", "branch3x3_2a", "branch3x3_2b",
                      "branch3x3dbl_3a", "branch3x3dbl_3b", "branch_pool")]
    assert sum(last) == inc.FEATURE_DIM


def test_bconv_matches_torch():
    """Folded conv+BN(eval)+relu == torch F.conv2d + F.batch_norm + relu."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 9, 9, 5).astype(np.float32)
    w = rng.randn(7, 5, 3, 3).astype(np.float32) * 0.2
    gamma = rng.randn(7).astype(np.float32)
    beta = rng.randn(7).astype(np.float32)
    mean = rng.randn(7).astype(np.float32)
    var = rng.uniform(0.5, 2.0, 7).astype(np.float32)

    scale = gamma / np.sqrt(var + inc.BN_EPS)
    shift = beta - mean * scale
    params = {"t": (jnp.asarray(w.transpose(2, 3, 1, 0)),
                    jnp.asarray(scale), jnp.asarray(shift))}
    ours = np.asarray(inc._bconv(jnp.asarray(x), params, "t",
                                 stride=2, pad=(1, 1)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    y = F.conv2d(xt, torch.from_numpy(w), stride=2, padding=1)
    y = F.batch_norm(y, torch.from_numpy(mean), torch.from_numpy(var),
                     torch.from_numpy(gamma), torch.from_numpy(beta),
                     training=False, eps=inc.BN_EPS)
    theirs = torch.relu(y).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_avg_pool_excl_pad_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    x = np.random.RandomState(2).randn(2, 8, 8, 3).astype(np.float32)
    ours = np.asarray(inc._avg_pool_excl_pad(jnp.asarray(x)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    theirs = F.avg_pool2d(xt, 3, stride=1, padding=1,
                          count_include_pad=False)
    np.testing.assert_allclose(
        ours, theirs.permute(0, 2, 3, 1).numpy(), atol=1e-6)


def test_features_shape_and_determinism(tmp_path):
    path = _random_npz(tmp_path / "fake_inception.npz")
    params = inc.load_inception_params(path)
    imgs = np.random.RandomState(3).rand(2, 32, 32, 1).astype(np.float32)
    f1 = inc.inception_features(imgs, params, batch=2)
    assert f1.shape == (2, inc.FEATURE_DIM)
    assert np.isfinite(f1).all()
    # input-sensitive: distinct images -> distinct features (a constant
    # output would mean the input never reaches pool3)
    assert np.abs(f1[0] - f1[1]).mean() > 1e-4
    f2 = inc.inception_features(imgs, params, batch=2)
    np.testing.assert_array_equal(f1, f2)


def test_load_errors_loudly(tmp_path):
    with pytest.raises(RuntimeError, match="cannot load"):
        inc.load_inception_params(str(tmp_path / "nope.npz"))
    bad = tmp_path / "partial.npz"
    np.savez(bad, **{"Conv2d_1a_3x3.conv.weight":
                     np.zeros((32, 3, 3, 3), np.float32)})
    with pytest.raises(RuntimeError, match="missing array"):
        inc.load_inception_params(str(bad))


def test_fid_label_matches_computation(tmp_path, monkeypatch):
    """compute_fid's fid_features label must always reflect the extractor
    that actually ran (round-1 bug: 'inception' label on random_conv
    features)."""
    from cliffordtpu.eval import fid as fid_mod
    from cliffordtpu.eval.fid import _get_features, compute_fid

    imgs = np.random.RandomState(4).rand(2, 32, 32, 1).astype(np.float32)

    with pytest.raises(ValueError, match="unknown feature extractor"):
        _get_features(imgs, "not_an_extractor")

    monkeypatch.delenv("CLIFFORDTPU_INCEPTION", raising=False)
    with pytest.raises(RuntimeError, match="CLIFFORDTPU_INCEPTION"):
        _get_features(imgs, "inception")

    path = _random_npz(tmp_path / "fake_inception.npz")
    monkeypatch.setenv("CLIFFORDTPU_INCEPTION", path)
    monkeypatch.setattr(fid_mod, "_INCEPTION_CACHE", {})
    feats = _get_features(imgs, "inception", batch=2)
    assert feats.shape == (2, inc.FEATURE_DIM)

    # end-to-end through compute_fid on a tiny model
    from cliffordtpu.eval import ModelHandle
    from cliffordtpu.nn import MLPVAE

    model = MLPVAE(h_dim=16, z_dim=4, distribution="clifford")
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key},
                           jnp.zeros((2, 784)))
    handle = ModelHandle(model, variables["params"])
    x_test = np.random.RandomState(5).rand(4, 28, 28, 1).astype(
        np.float32) * 2 - 1

    res = compute_fid(handle, x_test, "clifford", 4, in_channels=1,
                      n_samples=2, batch_size=2, key=key,
                      feature_extractor="auto")
    assert res["fid_features"] == "inception"
    assert np.isfinite(res["fid"])

    monkeypatch.delenv("CLIFFORDTPU_INCEPTION")
    res = compute_fid(handle, x_test, "clifford", 4, in_channels=1,
                      n_samples=2, batch_size=2, key=key,
                      feature_extractor="auto")
    assert res["fid_features"] == "random_conv"


def test_frechet_matches_torchmetrics_reference():
    """VERDICT r3 item 6: cross-check the mu/cov/Fréchet pipeline against
    the exact computation torchmetrics' FrechetInceptionDistance.compute
    performs, inlined in torch (torchmetrics itself is not installable in
    this zero-egress env): double-precision sum / x^T x accumulators,
    unbiased covariance, and tr sqrtm(S1 S2) via torch.linalg.eigvals
    (torchmetrics/image/fid.py::_compute_fid).  Identical feature sets in,
    FID out must agree to 1e-4 relative."""
    import torch

    from cliffordtpu.eval.fid import _frechet

    rng = np.random.default_rng(0)
    mix = rng.normal(size=(64, 64))
    a = rng.normal(size=(512, 64)) @ (0.3 * mix) + rng.normal(size=(64,))
    b = rng.normal(size=(512, 64)) @ (0.25 * mix) + rng.normal(
        size=(64,)) * 1.1

    mu1, c1 = a.mean(0), np.cov(a, rowvar=False)
    mu2, c2 = b.mean(0), np.cov(b, rowvar=False)
    ours = _frechet(mu1, c1, mu2, c2)

    # --- torchmetrics math, verbatim ---
    t1 = torch.from_numpy(a).double()
    t2 = torch.from_numpy(b).double()

    def tm_stats(x):
        n = x.shape[0]
        mu = x.sum(0) / n
        cov = (x.t().mm(x) - n * torch.outer(mu, mu)) / (n - 1)
        return mu, cov

    m1, s1 = tm_stats(t1)
    m2, s2 = tm_stats(t2)
    aa = (m1 - m2).square().sum(dim=-1)
    bb = s1.trace() + s2.trace()
    cc = torch.linalg.eigvals(s1 @ s2).sqrt().real.sum(dim=-1)
    want = float(aa + bb - 2.0 * cc)

    assert abs(ours - want) < 1e-4 * max(1.0, abs(want)), (ours, want)

    # rank-deficient corner (n < dim): generic sqrtm goes complex; both
    # the pipeline's clipped-eig path and the torch real-part path must
    # stay finite and close
    a_s, b_s = a[:32], b[:32]
    mu1, c1 = a_s.mean(0), np.cov(a_s, rowvar=False)
    mu2, c2 = b_s.mean(0), np.cov(b_s, rowvar=False)
    ours_s = _frechet(mu1, c1, mu2, c2)
    m1, s1 = tm_stats(torch.from_numpy(a_s).double())
    m2, s2 = tm_stats(torch.from_numpy(b_s).double())
    want_s = float((m1 - m2).square().sum(-1) + s1.trace() + s2.trace()
                   - 2.0 * torch.linalg.eigvals(s1 @ s2).sqrt().real.sum(-1))
    assert np.isfinite(ours_s)
    assert abs(ours_s - want_s) < 1e-2 * max(1.0, abs(want_s))
