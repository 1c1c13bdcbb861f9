"""torch ↔ flax parameter interop used by the parity harnesses.

Conversion rules (all verified numerically in tests/test_model_parity.py):

* Linear (out, in)              -> Dense kernel (in, out): ``.T``
* Conv2d (out, in, kh, kw)      -> Conv kernel (kh, kw, in, out):
  ``transpose(2, 3, 1, 0)``
* ConvTranspose2d (in, out, kh, kw) -> ConvTranspose kernel
  (kh, kw, in, out): **spatial flip** then ``transpose(2, 3, 0, 1)``
  (torch's transposed conv correlates with the flipped kernel; flax's
  ``transpose_kernel=False`` does not).
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_t(w):
    return jnp.asarray(w.T)


def conv_t(w):
    return jnp.asarray(w.transpose(2, 3, 1, 0))


def convtranspose_t(w):
    import numpy as np

    return jnp.asarray(np.flip(w, (2, 3)).transpose(2, 3, 0, 1).copy())


def torch_state_dict_to_numpy(torch_module):
    return {k: v.detach().cpu().numpy()
            for k, v in torch_module.state_dict().items()}


def copy_mlp_weights(sd, params, distribution: str):
    """Reference torch MLPVAE state_dict (numpy arrays) -> flax params.

    Layer map mirrors ``mnist/mlp_vae.py:26-47``: encoder.[0,2] -> enc1/2,
    decoder.[0,2,4] -> dec1/2/3, fc_mean, and fc_var (normal) or fc_scale
    (spherical families).
    """
    new = {k: dict(v) for k, v in params.items()}

    def set_dense(flax_name, torch_prefix):
        new[flax_name]["kernel"] = jnp.asarray(sd[f"{torch_prefix}.weight"].T)
        new[flax_name]["bias"] = jnp.asarray(sd[f"{torch_prefix}.bias"])

    set_dense("enc1", "encoder.0")
    set_dense("enc2", "encoder.2")
    set_dense("fc_mean", "fc_mean")
    if distribution == "normal":
        set_dense("fc_var", "fc_var")
    else:
        set_dense("fc_scale", "fc_scale")
    set_dense("dec1", "decoder.0")
    set_dense("dec2", "decoder.2")
    set_dense("dec3", "decoder.4")
    return new


def copy_cnn_encoder_weights(sd, params, distribution: str):
    """Reference CNN ``Encoder`` (``cnn/models.py:42-97``) -> flax
    ``cliffordtpu.nn.conv_vae.Encoder`` params (auto-named compact tree:
    ResBlock_i{Conv_0 main, Conv_1 skip}, Dense_0 mu, Dense_1 head)."""
    new = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in params.items()}
    i = 0
    while f"ResBlock_{i}" in new:
        blk = {"Conv_0": {
            "kernel": conv_t(sd[f"blocks.{i}.conv.weight"]),
            "bias": jnp.asarray(sd[f"blocks.{i}.conv.bias"]),
        }}
        if f"blocks.{i}.skip.weight" in sd:  # Identity when in_ch == out_ch
            blk["Conv_1"] = {
                "kernel": conv_t(sd[f"blocks.{i}.skip.weight"]),
                "bias": jnp.asarray(sd[f"blocks.{i}.skip.bias"]),
            }
        new[f"ResBlock_{i}"] = blk
        i += 1
    # torch flattens (C, H, W); the NHWC model flattens (H, W, C) — permute
    # the fc input axis accordingly (flat_dim = 512*2*2)
    def flat_in_t(w):
        out_dim = w.shape[0]
        return linear_t(w.reshape(out_dim, 512, 2, 2)
                        .transpose(0, 2, 3, 1).reshape(out_dim, -1))

    new["Dense_0"] = {"kernel": flat_in_t(sd["fc_mu.weight"]),
                      "bias": jnp.asarray(sd["fc_mu.bias"])}
    head = ("fc_log_var" if distribution == "gaussian"
            else "fc_concentration")
    new["Dense_1"] = {"kernel": flat_in_t(sd[f"{head}.weight"]),
                      "bias": jnp.asarray(sd[f"{head}.bias"])}
    return new


def copy_cnn_decoder_weights(sd, params):
    """Reference CNN ``Decoder`` (``cnn/models.py:100-131``) -> flax
    ``cliffordtpu.nn.conv_vae.Decoder`` params."""
    new = {k: (dict(v) if isinstance(v, dict) else v)
           for k, v in params.items()}
    # torch views the fc output as (512, 2, 2); the NHWC model reshapes to
    # (2, 2, 512) — permute the fc OUTPUT axis (and bias) accordingly
    w = sd["fc.weight"]  # (512*2*2, latent)
    w = w.reshape(512, 2, 2, w.shape[1]).transpose(1, 2, 0, 3).reshape(
        -1, w.shape[1])
    b = sd["fc.bias"].reshape(512, 2, 2).transpose(1, 2, 0).reshape(-1)
    new["Dense_0"] = {"kernel": linear_t(w), "bias": jnp.asarray(b)}
    i = 0
    while f"ResUpBlock_{i}" in new:
        blk = {"ConvTranspose_0": {
            "kernel": convtranspose_t(sd[f"blocks.{i}.conv.weight"]),
            "bias": jnp.asarray(sd[f"blocks.{i}.conv.bias"]),
        }}
        if f"blocks.{i}.skip.weight" in sd:
            blk["Conv_0"] = {
                "kernel": conv_t(sd[f"blocks.{i}.skip.weight"]),
                "bias": jnp.asarray(sd[f"blocks.{i}.skip.bias"]),
            }
        new[f"ResUpBlock_{i}"] = blk
        i += 1
    new["ConvTranspose_0"] = {
        "kernel": convtranspose_t(sd["final.0.weight"]),
        "bias": jnp.asarray(sd["final.0.bias"]),
    }
    return new


def rope_perm_t(w, n_heads: int):
    """``linear_t`` + permute the q/k OUTPUT dim from torch's interleaved
    RoPE pair layout (2i, 2i+1) to the half-split basis (i, i + hd/2) used
    by ``vit_vae.apply_rotary_half``.  The permutation is common to q and
    k, so q·k (and hence every block output, with or without RoPE) is
    unchanged — verified by tests/test_model_parity.py."""
    import numpy as np

    k = np.asarray(linear_t(w))  # (in, out)
    hd = k.shape[1] // n_heads
    idx = np.arange(k.shape[1]).reshape(n_heads, hd)
    perm = np.concatenate([idx[:, 0::2], idx[:, 1::2]], axis=1).reshape(-1)
    return jnp.asarray(k[:, perm])


def copy_transformer_block_weights(sd, params, n_heads: int):
    """Reference ``TransformerBlock`` (``cnn/cliffordar_model.py:105-116``)
    -> flax ``cliffordtpu.nn.vit_vae.TransformerBlock`` params."""
    return {
        "RMSNorm_0": {"scale": jnp.asarray(sd["norm1.weight"])},
        "RMSNorm_1": {"scale": jnp.asarray(sd["norm2.weight"])},
        "Attention_0": {
            "Dense_0": {"kernel": rope_perm_t(sd["attn.wq.weight"],
                                              n_heads)},
            "Dense_1": {"kernel": rope_perm_t(sd["attn.wk.weight"],
                                              n_heads)},
            "Dense_2": {"kernel": linear_t(sd["attn.wv.weight"])},
            "Dense_3": {"kernel": linear_t(sd["attn.wo.weight"])},
        },
        "SwiGLU_0": {
            "Dense_0": {"kernel": linear_t(sd["ffn.w1.weight"])},
            "Dense_1": {"kernel": linear_t(sd["ffn.w3.weight"])},
            "Dense_2": {"kernel": linear_t(sd["ffn.w2.weight"])},
        },
    }
