"""Hybrid CNN+ViT S-VAE (CliffordAR-style) — flax rebuild of
``cnn/cliffordar_model.py:23-604``.

TPU-first choices vs the torch reference:
* NHWC conv layout, bfloat16-friendly matmuls (dtype configurable),
* 2-D RoPE applied with real cos/sin arithmetic (no complex tensors),
* attention through ``jax.nn.dot_product_attention`` (XLA flash-attention
  path on TPU; sequence is 64 tokens + 4 registers at 32 px),
* per-token latent distributions built batched over (B, T) — no flattening
  round-trips (the reference reshapes to (B*T, D), ``:470-501``).

Architecture parity: RMSNorm(eps 1e-6), SwiGLU with d_ff = 8/3 d rounded up
to 256 (``:69-79``), pre-norm blocks (``:105-116``), GroupNorm+SiLU CNN
patchify/unpatchify stacks (``:121-207``), 4 learned register tokens
(``:232-233``), per-image-size default configs (``:321-364``), PS samples
scaled by sqrt(latent_dim) (``:491``).
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.nn.conv_vae import cnn_vae_loss
from cliffordtpu.nn.mlp_vae import l2_normalize
from cliffordtpu.nn.reparam import reparameterize, sample_latent

_XAVIER = nn.initializers.xavier_uniform()


# ---- 2d rotary position embeddings (``cliffordar_model.py:37-64``) ----


def rope_2d_cos_sin(image_size: int, patch_grid: int, head_dim: int,
                    cls_token_num: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables of shape (S, head_dim//2); registers get angle 0."""
    ys, xs = np.meshgrid(
        np.arange(patch_grid), np.arange(patch_grid), indexing="ij"
    )
    pos = np.stack([ys.ravel(), xs.ravel()], -1).astype(np.float32)
    half = head_dim // 4
    freqs = 1.0 / (10000.0 ** (np.arange(half, dtype=np.float32) / half))
    freqs_y = np.outer(pos[:, 0], freqs)
    freqs_x = np.outer(pos[:, 1], freqs)
    angles = np.concatenate([freqs_y, freqs_x], -1)  # (T, head_dim//2)
    if cls_token_num > 0:
        angles = np.concatenate(
            [np.zeros((cls_token_num, angles.shape[1]), np.float32), angles], 0
        )
    return np.cos(angles), np.sin(angles)


def apply_rotary(x, cos, sin):
    """Rotate interleaved pairs: complex multiply in real arithmetic
    (``cliffordar_model.py:58-64``). x: (B, S, H, D)."""
    B, S, H, D = x.shape
    x2 = x.reshape(B, S, H, D // 2, 2)
    x0, x1 = x2[..., 0], x2[..., 1]
    cos = cos[:S][None, :, None, :].astype(x.dtype)
    sin = sin[:S][None, :, None, :].astype(x.dtype)
    out0 = x0 * cos - x1 * sin
    out1 = x0 * sin + x1 * cos
    return jnp.stack([out0, out1], axis=-1).reshape(B, S, H, D)


def apply_rotary_half(x, cos, sin):
    """Rotate contiguous half pairs: pair i = (x[i], x[i + D/2]).

    Numerically identical to ``apply_rotary`` after permuting the head
    basis (interleaved pair (2i, 2i+1) -> (i, i + D/2)).  Because q and k
    are projections of learned matrices, the permutation is absorbed into
    Wq/Wk at init (xavier is iid, so the init distribution is unchanged)
    and cancels inside q·k — v and the output projection never see it.
    This removes the per-pair reshape/stack shuffles that showed up as
    ~1 ms/step of reshape+concatenate in the flagship decoder profile.
    Torch-weight interop permutes the imported wq/wk rows to match
    (``utils/torch_interop.py::rope_perm_t``)."""
    B, S, H, D = x.shape
    x0, x1 = x[..., : D // 2], x[..., D // 2:]
    cos = cos[:S][None, :, None, :].astype(x.dtype)
    sin = sin[:S][None, :, None, :].astype(x.dtype)
    return jnp.concatenate(
        [x0 * cos - x1 * sin, x0 * sin + x1 * cos], axis=-1)


# ---- transformer components ----


def _sliced_xavier(n_fused: int):
    """Xavier-uniform drawn per fused slice.

    A fused kernel of shape (fan_in, n_fused * d_out) initialised with plain
    xavier would use fan_out = n_fused * d_out and under-scale every slice
    vs the unfused Dense layers it replaces.  Drawing with
    fan_out = shape[1] // n_fused keeps the init distribution identical to
    ``n_fused`` independent xavier Dense kernels (all fused slices here have
    equal fan shapes)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = shape[0], shape[1] // n_fused
        limit = math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(
            key, shape, dtype, minval=-limit, maxval=limit)

    return init


class SwiGLU(nn.Module):
    """``cliffordar_model.py:69-79``.

    ``fused_proj``: compute w1 and w3 as ONE matmul over a column-pair
    interleaved kernel ``w13`` of shape (D, d_ff, 2) -> (D, 2*d_ff)
    (columns ordered (w1_0, w3_0, w1_1, w3_1, ...)).  Identical math —
    each output column is the same fan-in reduction — with one MXU kernel
    (and one dgrad/wgrad pair in the backward) instead of two.  The pair
    interleave keeps the silu(w1x)*w3x elementwise product shard-local
    when the fused axis is tensor-parallel over "model"."""

    d_model: int
    dtype: Any = jnp.float32
    fused_proj: bool = False

    @nn.compact
    def __call__(self, x):
        d_ff = int(self.d_model * 8 / 3)
        d_ff = ((d_ff + 255) // 256) * 256
        if self.fused_proj:
            y = nn.Dense(2 * d_ff, use_bias=False,
                         kernel_init=_sliced_xavier(2), dtype=self.dtype,
                         name="w13")(x)
            y = y.reshape(y.shape[:-1] + (d_ff, 2))
            h = nn.silu(y[..., 0]) * y[..., 1]
            return nn.Dense(self.d_model, use_bias=False,
                            kernel_init=_XAVIER, dtype=self.dtype,
                            name="w2")(h)
        w1 = nn.Dense(d_ff, use_bias=False, kernel_init=_XAVIER,
                      dtype=self.dtype)(x)
        w3 = nn.Dense(d_ff, use_bias=False, kernel_init=_XAVIER,
                      dtype=self.dtype)(x)
        return nn.Dense(self.d_model, use_bias=False, kernel_init=_XAVIER,
                        dtype=self.dtype)(nn.silu(w1) * w3)


def _use_fused_attention(q_shape) -> bool:
    """Opt-in fused RoPE+attention kernel (``CLIFFORDTPU_ATTENTION=pallas``).

    Off-TPU the request silently falls back to the XLA path (the kernel is
    Mosaic-only), as do shapes outside the kernel's VMEM envelope.  Kept
    opt-in until the on-chip A/B decides a default — the same protocol as
    ``fused_proj`` and the torus kernel (BASELINE.md).  Under tensor
    parallelism keep the XLA path: the kernel grid is over the batch only
    and has no head-sharding story.
    """
    if os.environ.get("CLIFFORDTPU_ATTENTION") != "pallas":
        return False
    if jax.default_backend() != "tpu":
        return False
    from cliffordtpu.kernels.attention_pallas import attention_supported

    return attention_supported(q_shape)


class Attention(nn.Module):
    """Non-causal MHA with 2-D RoPE (``cliffordar_model.py:82-102``).

    ``fused_proj``: q/k/v as ONE matmul over a head-interleaved kernel
    ``wqkv`` of shape (D, H, 3, hd) -> (D, 3D) (for each head h the
    columns [3*hd*h : 3*hd*(h+1)] are [q_h | k_h | v_h]).  Identical math
    with 1 MXU kernel instead of 3 forward (2 instead of 6 backward) —
    the flagship decoder step is bound by ~22 us dot_general launches at
    these shapes (BASELINE.md round-2 profile), so kernel count is the
    lever.  Head-grouping keeps every (q_h, k_h, v_h) triple on one shard
    under tensor parallelism over "model" (heads divisible by tp)."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32
    fused_proj: bool = False

    @nn.compact
    def __call__(self, x, cos, sin):
        B, S, D = x.shape
        hd = self.d_model // self.n_heads
        if self.fused_proj:
            y = nn.Dense(3 * D, use_bias=False,
                         kernel_init=_sliced_xavier(3), dtype=self.dtype,
                         name="wqkv")(x)
            y = y.reshape(B, S, self.n_heads, 3, hd)
            q, k, v = y[..., 0, :], y[..., 1, :], y[..., 2, :]
        else:
            q = nn.Dense(D, use_bias=False, kernel_init=_XAVIER,
                         dtype=self.dtype)(x)
            k = nn.Dense(D, use_bias=False, kernel_init=_XAVIER,
                         dtype=self.dtype)(x)
            v = nn.Dense(D, use_bias=False, kernel_init=_XAVIER,
                         dtype=self.dtype)(x)
            q = q.reshape(B, S, self.n_heads, hd)
            k = k.reshape(B, S, self.n_heads, hd)
            v = v.reshape(B, S, self.n_heads, hd)
        if _use_fused_attention(q.shape):
            # one launch per direction: RoPE + qk^T + softmax + pv fused,
            # scores never leave VMEM (kernels/attention_pallas.py)
            from cliffordtpu.kernels.attention_pallas import fused_attention

            out = fused_attention(q, k, v, cos, sin)
        else:
            if cos is not None:
                # half-split rotation in the permuted head basis (see
                # apply_rotary_half); q.k is invariant to the permutation
                q = apply_rotary_half(q, cos, sin)
                k = apply_rotary_half(k, cos, sin)
            out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, S, D)
        if self.fused_proj:
            return nn.Dense(D, use_bias=False, kernel_init=_XAVIER,
                            dtype=self.dtype, name="wo")(out)
        return nn.Dense(D, use_bias=False, kernel_init=_XAVIER,
                        dtype=self.dtype)(out)


class TransformerBlock(nn.Module):
    """Pre-norm block (``cliffordar_model.py:105-116``)."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32
    fused_proj: bool = False

    @nn.compact
    def __call__(self, x, cos, sin):
        x = x + Attention(self.d_model, self.n_heads, dtype=self.dtype,
                          fused_proj=self.fused_proj)(
            nn.RMSNorm(epsilon=1e-6)(x), cos, sin
        ).astype(x.dtype)
        x = x + SwiGLU(self.d_model, dtype=self.dtype,
                       fused_proj=self.fused_proj)(
            nn.RMSNorm(epsilon=1e-6)(x)).astype(x.dtype)
        return x


class _ScanBlockBody(nn.Module):
    """``TransformerBlock`` adapted to the (carry, out) contract of
    ``nn.scan``; used by the opt-in ``scan_layers`` stacks below."""

    d_model: int
    n_heads: int
    dtype: Any = jnp.float32
    fused_proj: bool = False

    @nn.compact
    def __call__(self, x, cos, sin):
        return TransformerBlock(self.d_model, self.n_heads,
                                dtype=self.dtype,
                                fused_proj=self.fused_proj)(x, cos, sin), None


def _run_blocks(x, cos, sin, n_layers, d_model, n_heads, dtype,
                scan_layers: bool, fused_proj: bool = False):
    """The transformer stack, unrolled (default) or as ONE lax.scan over
    layer-stacked weights (``scan_layers=True``).

    The scan form trades nothing numerically (identical math per layer)
    but changes the PARAM TREE (kernels gain a leading n_layers axis), so
    it is opt-in and checkpoint-incompatible with the unrolled form.
    Measured on v5e flagship32 (BASELINE.md round 3): throughput within
    noise of unrolled — the TPU executes a static schedule either way —
    while compile time drops (fewer distinct HLO computations).
    """
    if not scan_layers:
        for _ in range(n_layers):
            x = TransformerBlock(d_model, n_heads, dtype=dtype,
                                 fused_proj=fused_proj)(x, cos, sin)
        return x
    scanned = nn.scan(
        _ScanBlockBody,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        length=n_layers,
        in_axes=(nn.broadcast, nn.broadcast),
    )
    x, _ = scanned(d_model, n_heads, dtype=dtype,
                   fused_proj=fused_proj)(x, cos, sin)
    return x


# ---- CNN components (``cliffordar_model.py:121-207``) ----


def _gn(ch, dtype=jnp.float32):
    # dtype = compute dtype; params stay f32. bf16 GN is standard practice
    # for conv residual streams (normalization statistics at 8-bit mantissa
    # over >=64 channels are well-conditioned).
    return nn.GroupNorm(num_groups=min(32, max(1, ch // 4)), epsilon=1e-6,
                        dtype=dtype)


class ResDownBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(in_ch, self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER, dtype=self.dtype)(h)
        h = _gn(self.out_ch, self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER, dtype=self.dtype)(h)
        short = nn.Conv(self.out_ch, (2, 2), strides=(2, 2), padding="VALID",
                        use_bias=False, kernel_init=_XAVIER,
                        dtype=self.dtype)(x)
        return short + h


class ResUpBlock(nn.Module):
    """Decoder up-block with the extra ``block2`` residual
    (``cliffordar_model.py:165-195``)."""

    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _gn(in_ch, self.dtype)(x)
        h = nn.silu(h)
        h = nn.ConvTranspose(self.out_ch, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, kernel_init=_XAVIER,
                             dtype=self.dtype)(h)
        h = _gn(self.out_ch, self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER, dtype=self.dtype)(h)
        short = nn.ConvTranspose(self.out_ch, (2, 2), strides=(2, 2),
                                 padding="VALID", use_bias=False,
                                 kernel_init=_XAVIER, dtype=self.dtype)(x)
        x = short + h
        h2 = _gn(self.out_ch, self.dtype)(x)
        h2 = nn.silu(h2)
        h2 = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, kernel_init=_XAVIER, dtype=self.dtype)(h2)
        h2 = _gn(self.out_ch, self.dtype)(h2)
        h2 = nn.silu(h2)
        h2 = nn.Conv(self.out_ch, (3, 3), padding=((1, 1), (1, 1)),
                     use_bias=False, kernel_init=_XAVIER, dtype=self.dtype)(h2)
        return x + h2


# ---- encoder / decoder (``cliffordar_model.py:212-316``) ----


class ViTEncoder(nn.Module):
    n_layers: int
    n_heads: int
    d_model: int
    cnn_chs: Sequence[int]
    image_size: int
    patch_size: int
    register_tokens: int = 4
    dtype: Any = jnp.float32
    scan_layers: bool = False
    fused_proj: bool = False

    @nn.compact
    def __call__(self, image):
        x = nn.Conv(self.cnn_chs[0], (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER,
                    dtype=self.dtype)(image)
        for ch in self.cnn_chs[1:]:
            x = ResDownBlock(ch, dtype=self.dtype)(x)
        # token/residual stream stays in the compute dtype (bf16 on TPU);
        # norms compute statistics in f32 internally, heads cast back up
        x = x.astype(self.dtype)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)

        reg = self.param(
            "register_token",
            nn.initializers.normal(1.0),
            (self.register_tokens, self.d_model),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(reg[None].astype(x.dtype), (B,) + reg.shape),
             x], axis=1
        )
        grid = self.image_size // self.patch_size
        cos_np, sin_np = rope_2d_cos_sin(
            self.image_size, grid, self.d_model // self.n_heads,
            cls_token_num=self.register_tokens,
        )
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        x = _run_blocks(x, cos, sin, self.n_layers, self.d_model,
                        self.n_heads, self.dtype, self.scan_layers,
                        self.fused_proj)
        x = x[:, self.register_tokens:, :].astype(jnp.float32)
        x = nn.RMSNorm(epsilon=1e-6)(x)
        return nn.Dense(self.d_model, use_bias=False, kernel_init=_XAVIER)(x)


class ViTDecoder(nn.Module):
    n_layers: int
    n_heads: int
    d_model: int
    cnn_chs: Sequence[int]  # reversed stack, e.g. [512, 256, 64]
    out_channels: int
    image_size: int
    patch_size: int
    register_tokens: int = 4
    dtype: Any = jnp.float32
    scan_layers: bool = False
    fused_proj: bool = False

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        g = int(math.isqrt(T))
        h = x.reshape(B, g, g, C)
        h = nn.Conv(self.d_model, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=_XAVIER)(h)
        x = h.reshape(B, T, self.d_model).astype(self.dtype)

        reg = self.param(
            "register_token",
            nn.initializers.normal(1.0),
            (self.register_tokens, self.d_model),
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(reg[None].astype(x.dtype), (B,) + reg.shape),
             x], axis=1
        )
        grid = self.image_size // self.patch_size
        cos_np, sin_np = rope_2d_cos_sin(
            self.image_size, grid, self.d_model // self.n_heads,
            cls_token_num=self.register_tokens,
        )
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
        x = _run_blocks(x, cos, sin, self.n_layers, self.d_model,
                        self.n_heads, self.dtype, self.scan_layers,
                        self.fused_proj)
        x = x[:, self.register_tokens:, :]
        x = x.reshape(B, g, g, self.d_model)
        for ch in self.cnn_chs[1:]:
            x = ResUpBlock(ch, dtype=self.dtype)(x)
        x = _gn(x.shape[-1])(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=False, kernel_init=_XAVIER)(x)


# ---- default configs per image size (``cliffordar_model.py:321-364``) ----


def default_config(image_size: int) -> dict:
    if image_size == 256:
        return dict(cnn_chs=[64, 64, 128, 256, 512], z_channels=512,
                    encoder_vit_layers=6, decoder_vit_layers=12, patch_size=16)
    elif image_size == 64:
        return dict(cnn_chs=[64, 128, 256, 512], z_channels=512,
                    encoder_vit_layers=4, decoder_vit_layers=8, patch_size=8)
    elif image_size == 32:
        return dict(cnn_chs=[64, 256, 512], z_channels=512,
                    encoder_vit_layers=4, decoder_vit_layers=8, patch_size=4)
    num_stages = max(1, int(math.log2(image_size)) - 3)
    chs = [64]
    c = 64
    for _ in range(num_stages):
        c = min(c * 2, 512)
        chs.append(c)
    return dict(cnn_chs=chs, z_channels=chs[-1], encoder_vit_layers=4,
                decoder_vit_layers=8,
                patch_size=image_size // (2 ** num_stages))


# ---- main VAE class (``cliffordar_model.py:369-604``) ----


class CliffordARVAE(nn.Module):
    """Hybrid CNN+ViT S-VAE with per-token latents."""

    latent_dim: int = 16
    image_size: int = 256
    in_channels: int = 3
    distribution: str = "clifford"
    recon_loss_type: str = "l1"
    l1_weight: float = 1.0
    use_learnable_beta: bool = False
    l2_normalize: bool = False
    cnn_chs: Optional[Sequence[int]] = None
    z_channels: Optional[int] = None
    encoder_vit_layers: Optional[int] = None
    decoder_vit_layers: Optional[int] = None
    patch_size: Optional[int] = None
    register_tokens: int = 4
    concentration_floor: float = 0.03
    dtype: Any = jnp.float32  # compute dtype for transformer matmuls (bf16
    # for TPU throughput; params and distribution math stay f32)
    scan_layers: bool = False  # ONE lax.scan over layer-stacked ViT
    # weights instead of unrolled blocks (identical math, different param
    # tree — see _run_blocks; compile-time lever)
    fused_proj: bool = False  # fused wqkv / w13 projections (identical
    # math, fewer MXU kernel launches, different param tree — see
    # Attention/SwiGLU; convert checkpoints with nn.param_convert)

    def _cfg(self):
        cfg = default_config(self.image_size)
        return dict(
            cnn_chs=list(self.cnn_chs or cfg["cnn_chs"]),
            z_channels=self.z_channels or cfg["z_channels"],
            enc_layers=self.encoder_vit_layers or cfg["encoder_vit_layers"],
            dec_layers=self.decoder_vit_layers or cfg["decoder_vit_layers"],
            patch_size=self.patch_size or cfg["patch_size"],
        )

    @property
    def num_tokens(self) -> int:
        cfg = self._cfg()
        num_stages = len(cfg["cnn_chs"]) - 1
        grid = self.image_size // (2 ** num_stages)
        return grid * grid

    def setup(self):
        cfg = self._cfg()
        zc = cfg["z_channels"]
        n_heads = max(1, zc // 64)  # reference: zc // 64 (``:425``)
        self.encoder_vit = ViTEncoder(
            n_layers=cfg["enc_layers"], n_heads=n_heads, d_model=zc,
            cnn_chs=cfg["cnn_chs"], image_size=self.image_size,
            patch_size=cfg["patch_size"], register_tokens=self.register_tokens,
            dtype=self.dtype, scan_layers=self.scan_layers,
            fused_proj=self.fused_proj,
        )
        if self.distribution == "gaussian":
            self.quant_proj = nn.Dense(self.latent_dim * 2, kernel_init=_XAVIER)
        else:
            self.quant_proj = nn.Dense(self.latent_dim + 1, kernel_init=_XAVIER)
        dec_latent = (2 * self.latent_dim if self.distribution == "clifford"
                      else self.latent_dim)
        self.post_quant_proj = nn.Dense(zc, use_bias=False, kernel_init=_XAVIER)
        self.decoder_vit = ViTDecoder(
            n_layers=cfg["dec_layers"], n_heads=n_heads, d_model=zc,
            cnn_chs=cfg["cnn_chs"][::-1], out_channels=self.in_channels,
            image_size=self.image_size, patch_size=cfg["patch_size"],
            register_tokens=self.register_tokens, dtype=self.dtype,
            scan_layers=self.scan_layers, fused_proj=self.fused_proj,
        )
        self._dec_latent_dim = dec_latent
        if self.use_learnable_beta:
            self.log_sigma_0 = self.param(
                "log_sigma_0", nn.initializers.zeros, (1,))
            self.log_sigma_1 = self.param(
                "log_sigma_1", nn.initializers.zeros, (1,))

    def encode_heads(self, x):
        """encoder -> per-token (mu, params) (``cliffordar_model.py:503-522``)."""
        h = self.encoder_vit(x)  # (B, T, z_channels)
        proj = self.quant_proj(h)
        if self.distribution == "gaussian":
            return proj[..., : self.latent_dim], proj[..., self.latent_dim:]
        mu = proj[..., :-1]
        kappa = proj[..., -1]
        if self.distribution == "powerspherical":
            mu = l2_normalize(mu)
            kappa = jnp.clip(nn.softplus(kappa) + 0.8, max=10.0)
        else:  # clifford
            kappa = jnp.clip(
                nn.softplus(kappa) + self.concentration_floor, max=10.0
            )
        return mu, kappa

    def reparam(self, mu, params):
        """Per-token latents, batched over (B, T)
        (``cliffordar_model.py:470-501``)."""
        if self.distribution == "clifford":
            params = jnp.broadcast_to(params[..., None], mu.shape)
        q_z, p_z = reparameterize(
            self.distribution, mu, params, self.latent_dim
        )
        z = sample_latent(
            self.make_rng("sample"), self.distribution, q_z, self.l2_normalize
        )
        if self.distribution == "powerspherical":
            z = z * (self.latent_dim ** 0.5)  # R = sqrt(d) (``:491``)
        return z, q_z, p_z

    def decode(self, z):
        """(B, T, dec_dim) or flat (B, T*dec_dim) (``:524-533``)."""
        if z.ndim == 2:
            z = z.reshape(z.shape[0], self.num_tokens, self._dec_latent_dim)
        h = self.post_quant_proj(z)
        return self.decoder_vit(h)

    def __call__(self, x):
        mu, params = self.encode_heads(x)
        z, q_z, p_z = self.reparam(mu, params)
        x_recon = self.decode(z)
        return x_recon, q_z, p_z, mu

    def encode(self, x):
        """CliffordAR-compatible: (z, kl_loss) (``:541-550``)."""
        from cliffordtpu.distributions import kl_divergence

        mu, params = self.encode_heads(x)
        z, q_z, p_z = self.reparam(mu, params)
        kl = kl_divergence(q_z, p_z)
        if self.distribution == "gaussian":
            kl_loss = kl.sum(axis=-1).mean()
        else:
            kl_loss = kl.mean()
        return z, kl_loss

    def get_flat_latent(self, x):
        """(B, num_tokens * dec_dim) for VSA tests (``:593-599``)."""
        mu, params = self.encode_heads(x)
        z, _, _ = self.reparam(mu, params)
        return z.reshape(z.shape[0], -1)

    def normalize(self, x):
        """L2 normalize * sqrt(d) (``:601-604``)."""
        return l2_normalize(x) * (self.latent_dim ** 0.5)

    def loss_sigmas(self):
        if self.use_learnable_beta:
            return jnp.exp(self.log_sigma_0), jnp.exp(self.log_sigma_1)
        return None, None
