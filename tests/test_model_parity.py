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
        TransformerBlock as TorchTransformerBlock,
        get_2d_pos,
        precompute_freqs_cis_2d,
    )

from cliffordtpu.nn.conv_vae import Decoder, Encoder
from cliffordtpu.nn.vit_vae import TransformerBlock, rope_2d_cos_sin
from cliffordtpu.utils.torch_interop import (
    copy_cnn_decoder_weights,
    copy_cnn_encoder_weights,
    copy_transformer_block_weights,
    torch_state_dict_to_numpy,
)

KEY = jax.random.PRNGKey(0)


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
