"""Model-family tests: shapes, loss finiteness, one-step training for every
(model, distribution) combination the runners sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.nn import CNNVAE, CliffordARVAE, HybridVAE, MLPVAE
from cliffordtpu.train.loop import (
    make_cnn_train_step,
    make_mlp_train_step,
)
from cliffordtpu.train.state import create_train_state

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("dist", ["normal", "powerspherical", "vmf", "clifford"])
def test_mlp_vae_forward_shapes(dist):
    model = MLPVAE(h_dim=128, z_dim=8, distribution=dist)
    x = jax.random.uniform(KEY, (4, 784))
    variables = model.init({"params": KEY, "sample": KEY}, x)
    (z_mean, z_p2), (q_z, p_z), z, x_recon = model.apply(
        variables, x, rngs={"sample": KEY}
    )
    assert x_recon.shape == (4, 784)
    expected_z = 16 if dist == "clifford" else 8
    assert z.shape == (4, expected_z)


@pytest.mark.parametrize("dist", ["gaussian", "powerspherical", "clifford"])
def test_cnn_vae_step(dist):
    model = CNNVAE(latent_dim=32, in_channels=1, distribution=dist,
                   img_size=32)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    state = create_train_state(KEY, model, x, optimizer="adamw", lr=1e-4)
    step = make_cnn_train_step(model)
    l0 = None
    for i in range(3):
        state, losses = step(state, x, jax.random.fold_in(KEY, i),
                             jnp.float32(1.0))
        assert np.isfinite(float(losses["total_loss"]))
        if i == 0:
            l0 = float(losses["total_loss"])
    assert float(losses["total_loss"]) < l0


@pytest.mark.parametrize("dist", ["gaussian", "powerspherical", "clifford"])
def test_cliffordar_vae_step(dist):
    model = CliffordARVAE(
        latent_dim=8, image_size=32, in_channels=1, distribution=dist,
        cnn_chs=[16, 32, 64], z_channels=64, encoder_vit_layers=1,
        decoder_vit_layers=1, patch_size=4,
    )
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    state = create_train_state(KEY, model, x, optimizer="adamw", lr=1e-4)
    step = make_cnn_train_step(model)
    state, losses = step(state, x, KEY, jnp.float32(0.5))
    assert np.isfinite(float(losses["total_loss"]))
    # per-token latents: num_tokens = (32 / 2^2)^2 = 64
    assert model.num_tokens == 64


def test_cliffordar_flat_latent_and_decode_roundtrip():
    model = CliffordARVAE(
        latent_dim=4, image_size=32, in_channels=1, distribution="clifford",
        cnn_chs=[8, 16, 32], z_channels=32, encoder_vit_layers=1,
        decoder_vit_layers=1, patch_size=4,
    )
    x = jax.random.uniform(KEY, (2, 32, 32, 1))
    variables = model.init({"params": KEY, "sample": KEY}, x)
    flat = model.apply(variables, x, rngs={"sample": KEY},
                       method=model.get_flat_latent)
    assert flat.shape == (2, 64 * 8)  # T * 2*latent_dim
    # decoder accepts flat latents (backward-compat path, :524-533)
    recon = model.apply(variables, flat, method=model.decode)
    assert recon.shape == (2, 32, 32, 1)


def test_cliffordar_encode_api():
    model = CliffordARVAE(
        latent_dim=4, image_size=32, in_channels=1, distribution="clifford",
        cnn_chs=[8, 16, 32], z_channels=32, encoder_vit_layers=1,
        decoder_vit_layers=1, patch_size=4,
    )
    x = jax.random.uniform(KEY, (2, 32, 32, 1))
    variables = model.init({"params": KEY, "sample": KEY}, x)
    z, kl = model.apply(variables, x, rngs={"sample": KEY},
                        method=model.encode)
    assert z.shape == (2, 64, 8)
    assert np.isfinite(float(kl))


@pytest.mark.parametrize("dist", ["gaussian", "powerspherical", "clifford"])
def test_hybrid_vae_step(dist):
    model = HybridVAE(latent_dim=8, in_channels=1, distribution=dist,
                      encoder_chs=[16, 32, 64], img_size=32)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    state = create_train_state(KEY, model, x, optimizer="adamw", lr=1e-4)
    step = make_cnn_train_step(model)
    state, losses = step(state, x, KEY, jnp.float32(1.0))
    assert np.isfinite(float(losses["total_loss"]))
    assert model.num_tokens == (32 // 4) ** 2


def test_learnable_beta():
    model = CNNVAE(latent_dim=16, in_channels=1, distribution="clifford",
                   img_size=32, use_learnable_beta=True)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    state = create_train_state(
        KEY, model, x, optimizer="adamw", lr=1e-4, sigma_lr_scale=0.1
    )
    assert "log_sigma_0" in state.params
    step = make_cnn_train_step(model)
    state, losses = step(state, x, KEY, jnp.float32(1.0))
    assert "sigma_0" in losses
    assert np.isfinite(float(losses["total_loss"]))
    # sigmas must receive gradients
    assert float(jnp.abs(state.params["log_sigma_0"][0])) > 0


def test_concentration_floor_schedule():
    from cliffordtpu.nn.conv_vae import clifford_concentration_floor

    assert clifford_concentration_floor(128) == 0.04
    assert clifford_concentration_floor(512) == 0.07
    assert clifford_concentration_floor(1024) == 0.10
    assert clifford_concentration_floor(2048) == 0.13
    assert clifford_concentration_floor(4096) == 0.16


def test_beta_schedules():
    from cliffordtpu.train.schedules import cyclical_kl_beta, linear_kl_warmup

    assert linear_kl_warmup(0, 100) == 0.01
    assert linear_kl_warmup(99, 100) == 1.0
    assert linear_kl_warmup(150, 100) == 1.0
    # warmup ramp then triangle
    assert cyclical_kl_beta(0, 10, 20, 0.1, 1.0) == pytest.approx(0.1)
    assert cyclical_kl_beta(9, 10, 20, 0.1, 1.0) == pytest.approx(1.0)
    assert cyclical_kl_beta(10, 10, 20, 0.1, 1.0) == pytest.approx(0.1)
    assert cyclical_kl_beta(20, 10, 20, 0.1, 1.0) == pytest.approx(1.0)
    assert cyclical_kl_beta(30, 10, 20, 0.1, 1.0) == pytest.approx(0.1)


def test_ps_token_scaling():
    """PS per-token samples are scaled by sqrt(latent_dim) (:491)."""
    model = CliffordARVAE(
        latent_dim=16, image_size=32, in_channels=1,
        distribution="powerspherical", cnn_chs=[8, 16, 32], z_channels=32,
        encoder_vit_layers=1, decoder_vit_layers=1, patch_size=4,
    )
    x = jax.random.uniform(KEY, (2, 32, 32, 1))
    variables = model.init({"params": KEY, "sample": KEY}, x)
    flat = model.apply(variables, x, rngs={"sample": KEY},
                       method=model.get_flat_latent)
    z = flat.reshape(2, 64, 16)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(z), axis=-1), 4.0, atol=1e-3
    )


@pytest.mark.parametrize("family", ["vit", "cnn"])
def test_bf16_compute_path_close_to_f32(family):
    """The bench path (dtype=bfloat16: bf16 conv stacks + bf16 transformer
    residual stream) must track the f32 forward — same weights, same sample
    key — within bf16 resolution."""
    kwargs = dict(latent_dim=8, in_channels=1, distribution="clifford")
    if family == "vit":
        mk = lambda dt: CliffordARVAE(image_size=32, dtype=dt, **kwargs)
    else:
        mk = lambda dt: CNNVAE(img_size=32, dtype=dt, **kwargs)
    m32, m16 = mk(jnp.float32), mk(jnp.bfloat16)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1
    params = m32.init({"params": KEY, "sample": KEY}, x)["params"]
    r32 = m32.apply({"params": params}, x, rngs={"sample": KEY})[0]
    r16 = m16.apply({"params": params}, x, rngs={"sample": KEY})[0]
    assert r16.dtype == jnp.float32  # output head stays f32
    assert np.isfinite(np.asarray(r16)).all()
    # recon values live in [-1, 1] (tanh / conv head); bf16 has ~3 decimal
    # digits, deep stacks amplify — generous but non-vacuous bound
    assert np.max(np.abs(np.asarray(r16) - np.asarray(r32))) < 0.15


def test_iwae_cnn_and_vit_families():
    """IWAE bound extension for CNN/per-token models (the reference defines
    IWAE only for the MLP): finite, and the K=10 bound is no worse than K=1
    (IWAE monotonicity, allowing Monte-Carlo slack)."""
    from cliffordtpu.nn import CliffordARVAE, CNNVAE
    from cliffordtpu.nn.losses import iwae_log_likelihood_cnn

    x = jax.random.uniform(KEY, (4, 32, 32, 1)) * 2 - 1
    for model in (
        CNNVAE(latent_dim=8, in_channels=1, distribution="clifford"),
        CNNVAE(latent_dim=8, in_channels=1, distribution="gaussian"),
        CliffordARVAE(latent_dim=8, image_size=32, in_channels=1,
                      distribution="clifford"),
    ):
        params = model.init({"params": KEY, "sample": KEY}, x)["params"]
        k = jax.random.PRNGKey(7)
        ll1 = float(iwae_log_likelihood_cnn(k, model, params, x, n_samples=1))
        ll10 = float(iwae_log_likelihood_cnn(k, model, params, x,
                                             n_samples=10))
        assert np.isfinite(ll1) and np.isfinite(ll10), model.distribution
        assert ll10 >= ll1 - 20.0, (model.distribution, ll1, ll10)


def test_scan_layers_variant_trains_and_stacks_params():
    """``scan_layers=True`` runs the ViT stacks as ONE lax.scan over
    layer-stacked weights: kernels gain a leading n_layers axis, training
    stays finite, and forward output matches the unrolled model when the
    unrolled per-layer weights are stacked into the scan layout."""
    import jax.tree_util as jtu

    kw = dict(latent_dim=8, image_size=32, in_channels=1,
              distribution="clifford", cnn_chs=[16, 32, 64], z_channels=64,
              encoder_vit_layers=2, decoder_vit_layers=2, patch_size=4)
    x = jax.random.uniform(KEY, (2, 32, 32, 1)) * 2 - 1

    scan_model = CliffordARVAE(scan_layers=True, **kw)
    state = create_train_state(KEY, scan_model, x, optimizer="adamw",
                               lr=1e-4)
    stacked = [(jtu.keystr(p), leaf) for p, leaf in
               jtu.tree_leaves_with_path(state.params)
               if "ScanBlockBody" in jtu.keystr(p) and "kernel" in
               jtu.keystr(p)]
    assert stacked, "scan variant did not stack layer params"
    assert all(leaf.shape[0] == 2 for _, leaf in stacked)

    step = make_cnn_train_step(scan_model)
    state, losses = step(state, x, KEY, jnp.float32(1.0))
    assert np.isfinite(float(losses["total_loss"]))

    # forward equivalence: transplant unrolled weights into the scan tree
    unrolled = CliffordARVAE(scan_layers=False, **kw)
    up = unrolled.init({"params": KEY, "sample": KEY}, x)["params"]

    def to_scan(tree):
        out = {}
        layers = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                v = to_scan(v)
            if k.startswith("TransformerBlock_"):
                layers[int(k.split("_")[1])] = v
            else:
                out[k] = v
        if layers:
            stacked_tree = jtu.tree_map(
                lambda *leaves: jnp.stack(leaves, 0),
                *[layers[i] for i in sorted(layers)])
            out["Scan_ScanBlockBody_0"] = {
                "TransformerBlock_0": stacked_tree}
        return out

    sp = to_scan(up)
    k = jax.random.PRNGKey(3)
    out_unrolled = unrolled.apply({"params": up}, x, rngs={"sample": k})[0]
    out_scan = scan_model.apply({"params": sp}, x, rngs={"sample": k})[0]
    np.testing.assert_allclose(np.asarray(out_unrolled),
                               np.asarray(out_scan), rtol=1e-5, atol=1e-5)
