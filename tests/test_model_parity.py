"""Weight-copied forward parity for the CNN and ViT families vs the live
torch reference — extends the MLP-only coverage of test_elbo_parity.py.

Catches layout/convention mismatches the op-level tests cannot: transposed
-conv kernel flips, NCHW<->NHWC, RoPE complex-vs-real rotation, SwiGLU
wiring, SDPA scaling.  Targets: ``cnn/models.py:18-131``,
``cnn/cliffordar_model.py:23-116``.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch

    from cnn.models import Decoder as TorchDecoder
    from cnn.models import Encoder as TorchEncoder
    from cnn.cliffordar_model import (
        CliffordARVAE as TorchCliffordARVAE,
        HybridVAE as TorchHybridVAE,
        TransformerBlock as TorchTransformerBlock,
        ViTDecoder as TorchViTDecoder,
        ViTEncoder as TorchViTEncoder,
        get_2d_pos,
        precompute_freqs_cis_2d,
    )

from cliffordtpu.nn.conv_vae import Decoder, Encoder
from cliffordtpu.nn.hybrid_vae import HybridVAE
from cliffordtpu.nn.vit_vae import (
    CliffordARVAE,
    TransformerBlock,
    ViTDecoder,
    ViTEncoder,
    rope_2d_cos_sin,
)
from cliffordtpu.utils.torch_interop import (
    copy_cliffordar_weights,
    copy_cnn_decoder_weights,
    copy_cnn_encoder_weights,
    copy_hybrid_vae_weights,
    copy_transformer_block_weights,
    copy_vit_decoder_weights,
    copy_vit_encoder_weights,
    torch_state_dict_to_numpy,
)

KEY = jax.random.PRNGKey(0)

# tiny-but-complete ViT config shared by the full-stack tests below:
# one CNN stage (16 -> 64 ch), 8x8 token grid, d_model 64, 1 head
VIT_KW = dict(d_model=64, cnn_chs=[16, 64], image_size=16, patch_size=2)


def _assert_same_tree(copied, init_params):
    """The converted torch tree must match the flax init tree exactly
    (names AND leaf shapes) — catches silent module-renaming drift."""
    c = {p: np.shape(v) for p, v in
         jax.tree_util.tree_flatten_with_path(copied)[0]}
    i = {p: np.shape(v) for p, v in
         jax.tree_util.tree_flatten_with_path(init_params)[0]}
    assert c == i


@pytest.mark.parametrize("dist", ["gaussian", "powerspherical", "clifford"])
def test_cnn_encoder_parity(dist):
    torch.manual_seed(0)
    tm = TorchEncoder(latent_dim=16, in_channels=1, distribution=dist,
                      img_size=32, concentration_floor=0.1)
    jm = Encoder(latent_dim=16, distribution=dist, img_size=32,
                 concentration_floor=0.1)
    x = np.random.default_rng(0).uniform(
        -1, 1, (4, 1, 32, 32)).astype(np.float32)
    params = jm.init(KEY, jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = copy_cnn_encoder_weights(torch_state_dict_to_numpy(tm),
                                      params, dist)
    with torch.no_grad():
        t_mu, t_p2 = tm(torch.tensor(x))
    j_mu, j_p2 = jm.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_p2), t_p2.numpy(),
                               atol=1e-4, rtol=1e-4)


def test_cnn_decoder_parity():
    torch.manual_seed(1)
    tm = TorchDecoder(latent_dim=16, out_channels=1, img_size=32)
    jm = Decoder(out_channels=1, img_size=32)
    z = np.random.default_rng(1).normal(size=(4, 16)).astype(np.float32)
    params = jm.init(KEY, jnp.asarray(z))["params"]
    params = copy_cnn_decoder_weights(torch_state_dict_to_numpy(tm), params)
    with torch.no_grad():
        t_out = tm(torch.tensor(z)).numpy()  # (B, 1, 32, 32)
    j_out = jm.apply({"params": params}, jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out,
        atol=1e-4, rtol=1e-4)


def test_transformer_block_parity():
    """RMSNorm + RoPE attention + SwiGLU, with and without RoPE tables."""
    torch.manual_seed(2)
    d_model, n_heads = 64, 4
    head_dim = d_model // n_heads
    tm = TorchTransformerBlock(d_model, n_heads, causal=False)
    jm = TransformerBlock(d_model, n_heads)
    # 16 patch tokens (4x4 grid) + 2 leading register tokens
    pos = get_2d_pos(image_size=16, patch_size=4)
    freqs_cis = precompute_freqs_cis_2d(pos, head_dim, cls_token_num=2)
    cos, sin = rope_2d_cos_sin(image_size=16, patch_grid=4,
                               head_dim=head_dim, cls_token_num=2)
    x = np.random.default_rng(2).normal(size=(3, 18, d_model)).astype(
        np.float32)

    params = jm.init(KEY, jnp.asarray(x), jnp.asarray(cos),
                     jnp.asarray(sin))["params"]
    params = copy_transformer_block_weights(
        torch_state_dict_to_numpy(tm), params, n_heads)

    with torch.no_grad():
        t_out = tm(torch.tensor(x), freqs_cis=freqs_cis).numpy()
    j_out = jm.apply({"params": params}, jnp.asarray(x),
                     jnp.asarray(cos), jnp.asarray(sin))
    np.testing.assert_allclose(np.asarray(j_out), t_out,
                               atol=2e-4, rtol=1e-4)

    with torch.no_grad():
        t_out2 = tm(torch.tensor(x), freqs_cis=None).numpy()
    j_out2 = jm.apply({"params": params}, jnp.asarray(x), None, None)
    np.testing.assert_allclose(np.asarray(j_out2), t_out2,
                               atol=2e-4, rtol=1e-4)


def test_vit_encoder_full_parity():
    """conv_in + ResDownBlock stack + registers + blocks + norm + output
    (``cnn/cliffordar_model.py:212-259``), weights copied end to end."""
    torch.manual_seed(3)
    tm = TorchViTEncoder(n_layers=2, n_heads=1, in_channels=1,
                         register_tokens=4, **VIT_KW)
    jm = ViTEncoder(n_layers=2, n_heads=1, register_tokens=4, **VIT_KW)
    x = np.random.default_rng(3).uniform(
        -1, 1, (2, 1, 16, 16)).astype(np.float32)
    init = jm.init(KEY, jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = copy_vit_encoder_weights(torch_state_dict_to_numpy(tm),
                                      n_heads=1)
    _assert_same_tree(params, init)
    with torch.no_grad():
        t_out = tm(torch.tensor(x)).numpy()  # (B, 64, d_model)
    j_out = jm.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=5e-4, rtol=1e-4)


def test_vit_decoder_full_parity():
    """conv_in + registers + blocks + ResUpBlock stack + conv_out
    (``cnn/cliffordar_model.py:264-316``)."""
    torch.manual_seed(4)
    tm = TorchViTDecoder(n_layers=2, n_heads=1, out_channels=1,
                         register_tokens=4,
                         cnn_chs=[64, 16], d_model=64, image_size=16,
                         patch_size=2)
    jm = ViTDecoder(n_layers=2, n_heads=1, out_channels=1, register_tokens=4,
                    cnn_chs=[64, 16], d_model=64, image_size=16, patch_size=2)
    z = np.random.default_rng(4).normal(size=(2, 64, 64)).astype(np.float32)
    init = jm.init(KEY, jnp.asarray(z))["params"]
    params = copy_vit_decoder_weights(torch_state_dict_to_numpy(tm),
                                      n_heads=1)
    _assert_same_tree(params, init)
    with torch.no_grad():
        t_out = tm(torch.tensor(z)).numpy()  # (B, 1, 16, 16)
    j_out = jm.apply({"params": params}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("dist", ["gaussian", "powerspherical", "clifford"])
def test_cliffordar_full_parity(dist):
    """Whole-model deterministic paths (``cliffordar_model.py:369-604``):
    encoder -> (mu, kappa/logvar) incl. quant_proj + head activations, and
    decoder(z) incl. post_quant_proj — everything but the sampler, which
    has its own distribution-level parity tests."""
    torch.manual_seed(5)
    kw = dict(latent_dim=6, image_size=16, in_channels=1, distribution=dist,
              cnn_chs=[16, 64], z_channels=64, encoder_vit_layers=2,
              decoder_vit_layers=2, patch_size=2)
    tm = TorchCliffordARVAE(**kw)
    jm = CliffordARVAE(**kw)
    x = np.random.default_rng(5).uniform(
        -1, 1, (2, 1, 16, 16)).astype(np.float32)
    init = jm.init({"params": KEY, "sample": jax.random.PRNGKey(1)},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = copy_cliffordar_weights(torch_state_dict_to_numpy(tm), n_heads=1)
    _assert_same_tree(params, init)

    with torch.no_grad():
        t_mu, t_p2 = tm.encoder(torch.tensor(x))
    j_mu, j_p2 = jm.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          method="encode_heads")
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_p2), t_p2.numpy(),
                               atol=5e-4, rtol=1e-4)

    dec_dim = 12 if dist == "clifford" else 6
    z = np.random.default_rng(6).normal(
        size=(2, 64, dec_dim)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.decoder(torch.tensor(z)).numpy()
    j_out = jm.apply({"params": params}, jnp.asarray(z), method="decode")
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out, atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("dist", ["gaussian", "clifford"])
def test_hybrid_vae_full_parity(dist):
    """CNN-only per-token family (``cliffordar_model.py:607-848``):
    encoder heads (1x1-conv mu/kappa) and decoder (input_proj + up stack
    + tanh), weights copied end to end."""
    torch.manual_seed(6)
    kw = dict(latent_dim=6, in_channels=1, distribution=dist,
              encoder_chs=[16, 32], img_size=16)
    tm = TorchHybridVAE(**kw)
    jm = HybridVAE(**kw)
    x = np.random.default_rng(7).uniform(
        -1, 1, (2, 1, 16, 16)).astype(np.float32)
    init = jm.init({"params": KEY, "sample": jax.random.PRNGKey(1)},
                   jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    params = copy_hybrid_vae_weights(torch_state_dict_to_numpy(tm), dist)
    _assert_same_tree(params, init)

    with torch.no_grad():
        t_mu, t_p2 = tm.encoder(torch.tensor(x))
    j_mu, j_p2 = jm.apply({"params": params},
                          jnp.asarray(x.transpose(0, 2, 3, 1)),
                          method="encode_heads")
    np.testing.assert_allclose(np.asarray(j_mu), t_mu.numpy(),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_p2), t_p2.numpy(),
                               atol=5e-4, rtol=1e-4)

    dec_dim = 12 if dist == "clifford" else 6
    z = np.random.default_rng(8).normal(
        size=(2, 64, dec_dim)).astype(np.float32)
    with torch.no_grad():
        t_out = tm.decoder(torch.tensor(z)).numpy()
    j_out = jm.apply({"params": params}, jnp.asarray(z), method="decode")
    np.testing.assert_allclose(np.asarray(j_out).transpose(0, 3, 1, 2),
                               t_out, atol=5e-4, rtol=1e-4)
