"""VSA property tests: exact unbinding for unitary vectors, capacity curve
shapes, braiding invertibility, parity of ops with the torch reference."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.vsa import (
    bind,
    bundle,
    hrr_init,
    invert,
    normalize_vectors,
    permute_vector,
    similarity,
    unbind,
    unitary_init,
    unpermute_vector,
)
from cliffordtpu.vsa.capacity import (
    test_binding_unbinding_pairs,
    test_bundle_capacity,
    test_per_class_bundle_capacity_k_items,
)

KEY = jax.random.PRNGKey(7)


def test_unitary_exact_unbind():
    """unbind(bind(a,b), b) == a exactly for unitary b (|F[k]|=1)."""
    vecs = unitary_init(KEY, 4, 64)
    a, b = vecs[0], vecs[1]
    rec = unbind(bind(a, b), b, method="inv")
    np.testing.assert_allclose(np.asarray(rec), np.asarray(a), atol=1e-4)
    rec2 = unbind(bind(a, b), b, method="deconv")
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(a), atol=1e-4)


def test_unitary_init_unit_fourier_magnitude():
    for d in [32, 33, 128]:
        vecs = unitary_init(KEY, 3, d)
        mag = np.abs(np.fft.fft(np.asarray(vecs), axis=-1))
        np.testing.assert_allclose(mag, 1.0, atol=1e-4)


def test_invert_is_unbind_inverse():
    a = hrr_init(KEY, 1, 128)[0]
    b = unitary_init(jax.random.fold_in(KEY, 1), 1, 128)[0]
    np.testing.assert_allclose(
        np.asarray(bind(bind(a, b), invert(b))),
        np.asarray(a), atol=1e-4,
    )


def test_bind_commutes_and_distributes():
    vs = hrr_init(KEY, 3, 64)
    np.testing.assert_allclose(
        np.asarray(bind(vs[0], vs[1])), np.asarray(bind(vs[1], vs[0])),
        atol=1e-5,
    )


def test_braiding_roundtrip():
    v = hrr_init(KEY, 1, 64)[0]
    perm = jax.random.permutation(KEY, 64)
    np.testing.assert_allclose(
        np.asarray(unpermute_vector(permute_vector(v, perm), perm)),
        np.asarray(v), atol=1e-6,
    )


def test_bundle_scaling():
    vs = hrr_init(KEY, 16, 64)
    b = bundle(vs, normalize=True)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(vs.sum(0) / 4.0), atol=1e-6
    )


def test_ops_match_torch_reference():
    if not os.path.isdir("/root/reference"):
        pytest.skip("no reference")
    import torch

    sys.path.insert(0, "/root/reference")
    from utils import vsa as ref_vsa

    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 64)).astype(np.float32)
    b = rng.normal(size=(2, 64)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(bind(jnp.asarray(a), jnp.asarray(b))),
        ref_vsa.bind(torch.tensor(a), torch.tensor(b)).numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(invert(jnp.asarray(a))),
        ref_vsa.invert(torch.tensor(a)).numpy(),
        atol=1e-6,
    )
    for method in ["inv", "deconv"]:
        np.testing.assert_allclose(
            np.asarray(unbind(jnp.asarray(a), jnp.asarray(b), method)),
            ref_vsa.unbind(torch.tensor(a), torch.tensor(b), method).numpy(),
            atol=1e-4,
        )


def test_bundle_capacity_curve_shape():
    res = test_bundle_capacity(
        d=256, n_items=200, k_range=[2, 10, 40], n_trials=8, key=KEY
    )
    assert res["k"] == [2, 10, 40]
    # small bundles retrieve better than huge ones; k=2 should be near 1
    assert res["accuracy"][0] > 0.9
    assert res["accuracy"][0] >= res["accuracy"][-1] - 0.05


def test_role_filler_capacity_unitary_roles():
    res = test_binding_unbinding_pairs(
        d=256, n_items=200, k_range=[2, 6], n_trials=6,
        bind_with_random=True, key=KEY,
    )
    assert res["accuracy"][0] > 0.9


def test_role_filler_with_braiding_runs():
    res = test_binding_unbinding_pairs(
        d=128, n_items=100, k_range=[2], n_trials=3,
        bind_with_random=True, use_braiding=True, key=KEY,
    )
    assert 0.0 <= res["accuracy"][0] <= 1.0


def test_per_class_matrix(tmp_path):
    mem = hrr_init(KEY, 100, 64)
    labels = jnp.arange(100) % 10
    res = test_per_class_bundle_capacity_k_items(
        d=64, n_items=100, n_classes=10, items_per_class=2,
        item_memory=mem, labels=labels, plot=True, save_dir=str(tmp_path),
        key=KEY,
    )
    assert res["avg_similarity_matrix"].shape == (20, 20)
    np.testing.assert_allclose(
        np.diag(res["avg_similarity_matrix"]), 1.0, atol=1e-4
    )
    assert (tmp_path / "bundle_similarity_matrix.png").exists()
