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


def copy_transformer_block_weights(sd, params=None, n_heads: int = 1):
    """Reference ``TransformerBlock`` (``cnn/cliffordar_model.py:105-116``)
    -> flax ``cliffordtpu.nn.vit_vae.TransformerBlock`` params.  ``params``
    is unused (kept for call-site compatibility); the returned tree is
    complete."""
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


# ---- full ViT / Hybrid model interop ----------------------------------
# Complete state_dict -> flax param-tree converters for the remaining L2
# families, used by tests/test_model_parity.py to prove weight-copied
# forward parity of the WHOLE encoder/decoder stacks (GroupNorm grouping,
# register tokens, quant/post_quant projections), not just single blocks.


def _subdict(sd, prefix: str):
    n = len(prefix)
    return {k[n:]: v for k, v in sd.items() if k.startswith(prefix)}


def _count(sd, fmt: str) -> int:
    i = 0
    while any(k.startswith(fmt.format(i)) for k in sd):
        i += 1
    return i


def _gn_p(sd, name):
    return {"scale": jnp.asarray(sd[f"{name}.weight"]),
            "bias": jnp.asarray(sd[f"{name}.bias"])}


def _conv_p(sd, name):
    p = {"kernel": conv_t(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _convT_p(sd, name):
    p = {"kernel": convtranspose_t(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _dense_p(sd, name):
    p = {"kernel": linear_t(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        p["bias"] = jnp.asarray(sd[f"{name}.bias"])
    return p


def _res_down_block_p(sd, prefix):
    """``ResDownBlock``/``HybridResDownBlock`` (``cliffordar_model.py:120-137,
    611-625``): block = [GN, SiLU, Conv3x3 s2, GN, SiLU, Conv3x3] +
    Conv2x2-s2 shortcut."""
    return {
        "GroupNorm_0": _gn_p(sd, f"{prefix}block.0"),
        "Conv_0": _conv_p(sd, f"{prefix}block.2"),
        "GroupNorm_1": _gn_p(sd, f"{prefix}block.3"),
        "Conv_1": _conv_p(sd, f"{prefix}block.5"),
        "Conv_2": _conv_p(sd, f"{prefix}shortcut"),
    }


def _res_up_block_p(sd, prefix):
    """ViT ``ResUpBlock`` (``cliffordar_model.py:165-195``) with the
    two-conv ``block2`` extra residual."""
    return {
        "GroupNorm_0": _gn_p(sd, f"{prefix}block.0"),
        "ConvTranspose_0": _convT_p(sd, f"{prefix}block.2"),
        "GroupNorm_1": _gn_p(sd, f"{prefix}block.3"),
        "Conv_0": _conv_p(sd, f"{prefix}block.5"),
        "ConvTranspose_1": _convT_p(sd, f"{prefix}shortcut"),
        "GroupNorm_2": _gn_p(sd, f"{prefix}block2.0"),
        "Conv_1": _conv_p(sd, f"{prefix}block2.2"),
        "GroupNorm_3": _gn_p(sd, f"{prefix}block2.3"),
        "Conv_2": _conv_p(sd, f"{prefix}block2.5"),
    }


def _hybrid_res_up_block_p(sd, prefix):
    """``HybridResUpBlock`` (``cliffordar_model.py:628-650``) — single-conv
    ``block2`` variant."""
    return {
        "GroupNorm_0": _gn_p(sd, f"{prefix}block.0"),
        "ConvTranspose_0": _convT_p(sd, f"{prefix}block.2"),
        "GroupNorm_1": _gn_p(sd, f"{prefix}block.3"),
        "Conv_0": _conv_p(sd, f"{prefix}block.5"),
        "ConvTranspose_1": _convT_p(sd, f"{prefix}shortcut"),
        "GroupNorm_2": _gn_p(sd, f"{prefix}block2.0"),
        "Conv_1": _conv_p(sd, f"{prefix}block2.2"),
    }


def copy_vit_encoder_weights(sd, n_heads: int):
    """Reference ``ViTEncoder`` (``cliffordar_model.py:212-259``) ->
    flax ``cliffordtpu.nn.vit_vae.ViTEncoder`` params."""
    new = {
        "Conv_0": _conv_p(sd, "conv_in"),
        "register_token": jnp.asarray(sd["register_token.weight"]),
        "RMSNorm_0": {"scale": jnp.asarray(sd["norm.weight"])},
        "Dense_0": {"kernel": linear_t(sd["output.weight"])},
    }
    for i in range(_count(sd, "patchify.0.net.{}.")):
        new[f"ResDownBlock_{i}"] = _res_down_block_p(
            sd, f"patchify.0.net.{i}.")
    for i in range(_count(sd, "layers.{}.")):
        new[f"TransformerBlock_{i}"] = copy_transformer_block_weights(
            _subdict(sd, f"layers.{i}."), n_heads=n_heads)
    return new


def copy_vit_decoder_weights(sd, n_heads: int):
    """Reference ``ViTDecoder`` (``cliffordar_model.py:264-316``) ->
    flax ``cliffordtpu.nn.vit_vae.ViTDecoder`` params."""
    new = {
        "Conv_0": _conv_p(sd, "conv_in.1"),
        "register_token": jnp.asarray(sd["register_token.weight"]),
        "GroupNorm_0": _gn_p(sd, "conv_out.0"),
        "Conv_1": _conv_p(sd, "conv_out.2"),
    }
    for i in range(_count(sd, "layers.{}.")):
        new[f"TransformerBlock_{i}"] = copy_transformer_block_weights(
            _subdict(sd, f"layers.{i}."), n_heads=n_heads)
    for i in range(_count(sd, "unpatchify.1.net.{}.")):
        new[f"ResUpBlock_{i}"] = _res_up_block_p(sd, f"unpatchify.1.net.{i}.")
    return new


def copy_cliffordar_weights(sd, n_heads: int):
    """Reference ``CliffordARVAE`` (``cliffordar_model.py:369-604``) ->
    flax ``cliffordtpu.nn.vit_vae.CliffordARVAE`` params (quant_proj /
    post_quant_proj included; learnable-beta sigmas copied when present)."""
    new = {
        "encoder_vit": copy_vit_encoder_weights(
            _subdict(sd, "encoder_vit."), n_heads),
        "quant_proj": _dense_p(sd, "quant_proj"),
        "post_quant_proj": {"kernel": linear_t(sd["post_quant_proj.weight"])},
        "decoder_vit": copy_vit_decoder_weights(
            _subdict(sd, "decoder_vit."), n_heads),
    }
    if "log_sigma_0" in sd:
        new["log_sigma_0"] = jnp.asarray(sd["log_sigma_0"])
        new["log_sigma_1"] = jnp.asarray(sd["log_sigma_1"])
    return new


def copy_hybrid_vae_weights(sd, distribution: str):
    """Reference ``HybridVAE`` (``cliffordar_model.py:712-848``) ->
    flax ``cliffordtpu.nn.hybrid_vae.HybridVAE`` params."""
    enc = {
        "input_conv": _conv_p(sd, "encoder.input_conv"),
        "fc_mu": _conv_p(sd, "encoder.fc_mu"),
    }
    if distribution == "gaussian":
        enc["fc_logvar"] = _conv_p(sd, "encoder.fc_logvar")
    else:
        enc["fc_kappa"] = _conv_p(sd, "encoder.fc_kappa")
    for i in range(_count(sd, "encoder.down_blocks.{}.")):
        enc[f"down_{i}"] = _res_down_block_p(sd, f"encoder.down_blocks.{i}.")
    dec = {
        "input_proj": _dense_p(sd, "decoder.input_proj"),
        "GroupNorm_0": _gn_p(sd, "decoder.output_conv.0"),
        "output_conv": _conv_p(sd, "decoder.output_conv.2"),
    }
    for i in range(_count(sd, "decoder.up_blocks.{}.")):
        dec[f"up_{i}"] = _hybrid_res_up_block_p(sd, f"decoder.up_blocks.{i}.")
    new = {"encoder": enc, "decoder": dec}
    if "log_sigma_0" in sd:
        new["log_sigma_0"] = jnp.asarray(sd["log_sigma_0"])
        new["log_sigma_1"] = jnp.asarray(sd["log_sigma_1"])
    return new
