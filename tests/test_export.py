"""StableHLO serving export (``cliffordtpu/serving.py``): exported
encode_mu / encode_z / decode equal the direct model calls, the batch
dimension is symbolic (one artifact serves any batch), and bundles
round-trip through disk without the Python model code path."""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.nn import CliffordARVAE, MLPVAE
from cliffordtpu.serving import (
    export_serving,
    load_serving,
    serving_fns,
)

KEY = jax.random.PRNGKey(0)


def _mlp():
    m = MLPVAE(h_dim=32, z_dim=6, distribution="clifford")
    x = jax.random.uniform(KEY, (4, 28, 28, 1))
    params = m.init({"params": KEY, "sample": KEY},
                    x.reshape(4, -1))["params"]
    return m, params, (28, 28, 1)


def _vit():
    m = CliffordARVAE(latent_dim=6, image_size=32, in_channels=1,
                      distribution="clifford", cnn_chs=[8, 32, 64],
                      z_channels=64, encoder_vit_layers=1,
                      decoder_vit_layers=1, patch_size=4, fused_proj=True)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    params = m.init({"params": KEY, "sample": KEY}, x)["params"]
    return m, params, (32, 32, 1)


def _cnn():
    from cliffordtpu.nn import CNNVAE

    m = CNNVAE(latent_dim=8, in_channels=1, distribution="clifford",
               img_size=32)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    params = m.init({"params": KEY, "sample": KEY}, x)["params"]
    return m, params, (32, 32, 1)


def _hybrid():
    from cliffordtpu.nn import HybridVAE

    m = HybridVAE(latent_dim=4, in_channels=1, distribution="clifford",
                  img_size=32, encoder_chs=[8, 16], decoder_chs=[16, 8])
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    params = m.init({"params": KEY, "sample": KEY}, x)["params"]
    return m, params, (32, 32, 1)


@pytest.mark.parametrize("factory", [_mlp, _vit, _cnn, _hybrid],
                         ids=["mlp", "vit_fused", "cnn", "hybrid"])
def test_export_roundtrip_matches_direct(tmp_path, factory):
    model, params, img_shape = factory()
    out = str(tmp_path / "bundle")
    res = export_serving(model, params, img_shape, out_dir=out)
    mani = res["manifest"]
    assert mani["format_version"] == 1
    assert set(mani["functions"]) == {"encode_mu", "encode_z", "decode"}
    # all three lower shape-polymorphically on this jax version
    assert all(v["batch"] == "symbolic" for v in mani["functions"].values())
    assert mani["functions"]["decode"]["out"]["shape"][0] == "b"

    srv = load_serving(out)
    fns = serving_fns(model, img_shape)
    skey = jax.random.PRNGKey(7)
    raw = jnp.asarray(jax.random.key_data(skey), jnp.uint32)
    # two different batch sizes through the SAME artifact
    for B in (3, 5):
        xb = jax.random.uniform(jax.random.PRNGKey(B),
                                (B, *img_shape)) * 2 - 1
        np.testing.assert_allclose(np.asarray(fns["encode_mu"](params, xb)),
                                   np.asarray(srv.encode_mu(xb)), atol=1e-5)
        z_direct = fns["encode_z"](params, raw, xb)
        z_srv = srv.encode_z(skey, xb)  # typed key accepted
        np.testing.assert_allclose(np.asarray(z_direct), np.asarray(z_srv),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(fns["decode"](params, z_direct)),
                                   np.asarray(srv.decode(z_srv)), atol=1e-5)


def test_bundle_is_self_contained(tmp_path):
    """The on-disk bundle lists exactly the documented files and the
    manifest records the calling convention."""
    model, params, img_shape = _mlp()
    out = str(tmp_path / "bundle")
    export_serving(model, params, img_shape, out_dir=out)
    files = sorted(os.listdir(out))
    assert files == ["decode.stablehlo", "encode_mu.stablehlo",
                     "encode_z.stablehlo", "manifest.json", "params.npz"]
    with open(os.path.join(out, "manifest.json")) as f:
        mani = json.load(f)
    assert mani["flat_z_dim"] == 12  # clifford: 2 * z_dim
    assert mani["decode_output"] == "sigmoid_logits"
    assert "tpu" in mani["platforms"] and "cpu" in mani["platforms"]


def test_params_hot_swap(tmp_path):
    """Weights are an argument, not baked into the module: swapping
    params.npz changes the outputs without re-exporting."""
    model, params, img_shape = _mlp()
    out = str(tmp_path / "bundle")
    export_serving(model, params, img_shape, out_dir=out)
    srv = load_serving(out)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, *img_shape))
    mu_before = np.asarray(srv.encode_mu(x))
    srv.params = jax.tree_util.tree_map(lambda a: a * 0.0, srv.params)
    mu_after = np.asarray(srv.encode_mu(x))
    assert not np.allclose(mu_before, mu_after)
    np.testing.assert_allclose(mu_after, 0.0, atol=1e-6)


def test_export_cli(tmp_path):
    """scripts/export_model.py end-to-end from a real runner checkpoint."""
    from cliffordtpu.train.checkpoint import save_checkpoint
    from cliffordtpu.train.state import create_train_state

    # h_dim=128 matches eval_checkpoint.build_model's mlp construction
    model = MLPVAE(h_dim=128, z_dim=6, distribution="clifford")
    x = jax.random.uniform(KEY, (4, 28, 28, 1))
    state = create_train_state(KEY, model, x.reshape(4, -1),
                               optimizer="adam", lr=1e-3)
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(ckpt_dir)
    save_checkpoint(ckpt_dir, state, step=1, best_metric=0.5)

    out = str(tmp_path / "bundle")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "export_model.py"),
         "--ckpt", ckpt_dir, "--arch", "mlp", "--distribution", "clifford",
         "--latent_dim", "6", "--img_size", "28", "--outdir", out],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    srv = load_serving(out)
    y = srv.decode(np.zeros((2, 12), np.float32))
    assert y.shape == (2, 784)
    assert np.isfinite(np.asarray(y)).all()


def test_data_parallel_export(tmp_path):
    """A bundle exported with data_parallel=8 serves batch-sharded over
    the ("data",) mesh with values equal to the single-device path, at
    any batch multiple of the mesh size (symbolic 8*b)."""
    model, params, img_shape = _mlp()
    out = str(tmp_path / "bundle")
    res = export_serving(model, params, img_shape, out_dir=out,
                         data_parallel=8)
    mani = res["manifest"]
    assert mani["data_parallel"] == 8
    assert all(v["batch"] == "symbolic" for v in mani["functions"].values())
    assert mani["functions"]["encode_mu"]["in"][0]["shape"][0] == "8*b"

    srv = load_serving(out)
    fns = serving_fns(model, img_shape)
    skey = jax.random.PRNGKey(3)
    raw = jnp.asarray(jax.random.key_data(skey), jnp.uint32)
    for B in (8, 24):
        xb = jax.random.uniform(jax.random.PRNGKey(B), (B, *img_shape))
        mu = srv.encode_mu(xb)
        np.testing.assert_allclose(np.asarray(fns["encode_mu"](params, xb)),
                                   np.asarray(mu), atol=1e-6)
        assert "data" in str(mu.sharding)  # actually sharded on the mesh
        z = srv.encode_z(skey, xb)
        np.testing.assert_allclose(
            np.asarray(fns["encode_z"](params, raw, xb)),
            np.asarray(z), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fns["decode"](params, z)),
            np.asarray(srv.decode(z)), atol=1e-6)


@pytest.mark.parametrize("mode,max_err,shrink", [
    ("bfloat16", 5e-3, 1.6), ("int8", 5e-2, 2.5)])
def test_quantized_params_storage(tmp_path, mode, max_err, shrink):
    """params_dtype quantizes ONLY the stored weights: the artifact
    shrinks, the graphs are unchanged, and serve outputs stay close to
    the float32 bundle."""
    model, params, img_shape = _mlp()
    out32 = str(tmp_path / "f32")
    outq = str(tmp_path / mode)
    export_serving(model, params, img_shape, out_dir=out32)
    res = export_serving(model, params, img_shape, out_dir=outq,
                         params_dtype=mode)
    assert res["manifest"]["params_dtype"] == mode
    s32 = os.path.getsize(os.path.join(out32, "params.npz"))
    sq = os.path.getsize(os.path.join(outq, "params.npz"))
    assert s32 / sq > shrink

    srv32, srvq = load_serving(out32), load_serving(outq)
    x = jax.random.uniform(jax.random.PRNGKey(2), (3, *img_shape))
    mu32 = np.asarray(srv32.encode_mu(x))
    muq = np.asarray(srvq.encode_mu(x))
    err = np.max(np.abs(mu32 - muq)) / (np.max(np.abs(mu32)) + 1e-9)
    assert err < max_err, err
