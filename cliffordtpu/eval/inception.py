"""InceptionV3 (FID variant) feature extractor, native JAX.

The reference computes FID with torchmetrics' ``FrechetInceptionDistance``
(``utils/wandb_utils.py:1567-1596``), which wraps pytorch-fid's
``InceptionV3`` — the torchvision graph with three quirks kept here:

* every 3x3/s1/p1 average pool uses ``count_include_pad=False``,
* the **last** InceptionE block (``Mixed_7c``) uses a *max* pool branch,
* inputs are bilinear-resized to 299x299 and mapped to ``2x - 1``.

Weights are loaded from an ``.npz`` whose keys are the torch
``state_dict()`` names (``Mixed_5b.branch1x1.conv.weight``,
``....bn.running_var``, ...) — i.e. the output of::

    np.savez(path, **{k: v.numpy() for k, v in sd.items()})

for either the torchvision ``inception_v3`` weights or pytorch-fid's
``pt_inception-2015-12-05`` checkpoint.  BatchNorm (eval mode, eps=1e-3)
is folded into a per-channel scale/shift at load time, so the hot path is
pure conv+mul+add+relu — MXU-friendly and fully fusable by XLA.

There is deliberately NO fallback here: callers that cannot provide
weights must use the ``random_conv`` surrogate in ``eval/fid.py`` and
label it as such.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3
FEATURE_DIM = 2048
INPUT_SIZE = 299


def _conv_defs() -> Dict[str, Tuple[int, int, int, int]]:
    """Ordered ``name -> (cin, cout, kh, kw)`` for every conv in the net."""
    defs: Dict[str, Tuple[int, int, int, int]] = {}

    def add(name, cin, cout, kh, kw):
        defs[name] = (cin, cout, kh, kw)

    # stem
    add("Conv2d_1a_3x3", 3, 32, 3, 3)
    add("Conv2d_2a_3x3", 32, 32, 3, 3)
    add("Conv2d_2b_3x3", 32, 64, 3, 3)
    add("Conv2d_3b_1x1", 64, 80, 1, 1)
    add("Conv2d_4a_3x3", 80, 192, 3, 3)

    def block_a(p, cin, pool):
        add(f"{p}.branch1x1", cin, 64, 1, 1)
        add(f"{p}.branch5x5_1", cin, 48, 1, 1)
        add(f"{p}.branch5x5_2", 48, 64, 5, 5)
        add(f"{p}.branch3x3dbl_1", cin, 64, 1, 1)
        add(f"{p}.branch3x3dbl_2", 64, 96, 3, 3)
        add(f"{p}.branch3x3dbl_3", 96, 96, 3, 3)
        add(f"{p}.branch_pool", cin, pool, 1, 1)

    def block_b(p, cin):
        add(f"{p}.branch3x3", cin, 384, 3, 3)
        add(f"{p}.branch3x3dbl_1", cin, 64, 1, 1)
        add(f"{p}.branch3x3dbl_2", 64, 96, 3, 3)
        add(f"{p}.branch3x3dbl_3", 96, 96, 3, 3)

    def block_c(p, cin, c7):
        add(f"{p}.branch1x1", cin, 192, 1, 1)
        add(f"{p}.branch7x7_1", cin, c7, 1, 1)
        add(f"{p}.branch7x7_2", c7, c7, 1, 7)
        add(f"{p}.branch7x7_3", c7, 192, 7, 1)
        add(f"{p}.branch7x7dbl_1", cin, c7, 1, 1)
        add(f"{p}.branch7x7dbl_2", c7, c7, 7, 1)
        add(f"{p}.branch7x7dbl_3", c7, c7, 1, 7)
        add(f"{p}.branch7x7dbl_4", c7, c7, 7, 1)
        add(f"{p}.branch7x7dbl_5", c7, 192, 1, 7)
        add(f"{p}.branch_pool", cin, 192, 1, 1)

    def block_d(p, cin):
        add(f"{p}.branch3x3_1", cin, 192, 1, 1)
        add(f"{p}.branch3x3_2", 192, 320, 3, 3)
        add(f"{p}.branch7x7x3_1", cin, 192, 1, 1)
        add(f"{p}.branch7x7x3_2", 192, 192, 1, 7)
        add(f"{p}.branch7x7x3_3", 192, 192, 7, 1)
        add(f"{p}.branch7x7x3_4", 192, 192, 3, 3)

    def block_e(p, cin):
        add(f"{p}.branch1x1", cin, 320, 1, 1)
        add(f"{p}.branch3x3_1", cin, 384, 1, 1)
        add(f"{p}.branch3x3_2a", 384, 384, 1, 3)
        add(f"{p}.branch3x3_2b", 384, 384, 3, 1)
        add(f"{p}.branch3x3dbl_1", cin, 448, 1, 1)
        add(f"{p}.branch3x3dbl_2", 448, 384, 3, 3)
        add(f"{p}.branch3x3dbl_3a", 384, 384, 1, 3)
        add(f"{p}.branch3x3dbl_3b", 384, 384, 3, 1)
        add(f"{p}.branch_pool", cin, 192, 1, 1)

    block_a("Mixed_5b", 192, 32)
    block_a("Mixed_5c", 256, 64)
    block_a("Mixed_5d", 288, 64)
    block_b("Mixed_6a", 288)
    for name, c7 in [("Mixed_6b", 128), ("Mixed_6c", 160),
                     ("Mixed_6d", 160), ("Mixed_6e", 192)]:
        block_c(name, 768, c7)
    block_d("Mixed_7a", 768)
    block_e("Mixed_7b", 1280)
    block_e("Mixed_7c", 2048)
    return defs


CONV_DEFS = _conv_defs()


def param_spec() -> Dict[str, Tuple[int, ...]]:
    """torch-state_dict key -> shape for every array the npz must hold."""
    spec: Dict[str, Tuple[int, ...]] = {}
    for name, (cin, cout, kh, kw) in CONV_DEFS.items():
        spec[f"{name}.conv.weight"] = (cout, cin, kh, kw)
        for bn_arr in ("weight", "bias", "running_mean", "running_var"):
            spec[f"{name}.bn.{bn_arr}"] = (cout,)
    return spec


def load_inception_params(path: str) -> Dict[str, tuple]:
    """Load + fold an npz of torch-named arrays.  Errors loudly on any
    missing key or shape mismatch — this extractor never silently degrades
    to a surrogate."""
    try:
        raw = np.load(path)
    except Exception as e:
        raise RuntimeError(
            f"cannot load InceptionV3 weights npz at {path!r}: {e}"
        ) from e
    params: Dict[str, tuple] = {}
    for name, (cin, cout, kh, kw) in CONV_DEFS.items():
        try:
            w = raw[f"{name}.conv.weight"]
            gamma = raw[f"{name}.bn.weight"]
            beta = raw[f"{name}.bn.bias"]
            mean = raw[f"{name}.bn.running_mean"]
            var = raw[f"{name}.bn.running_var"]
        except KeyError as e:
            raise RuntimeError(
                f"InceptionV3 npz {path!r} is missing array {e} "
                f"(expected torch state_dict naming; see "
                f"cliffordtpu.eval.inception.param_spec())"
            ) from e
        if w.shape != (cout, cin, kh, kw):
            raise RuntimeError(
                f"{name}.conv.weight has shape {w.shape}, "
                f"expected {(cout, cin, kh, kw)}")
        scale = gamma / np.sqrt(var + BN_EPS)
        shift = beta - mean * scale
        params[name] = (
            jnp.asarray(w.transpose(2, 3, 1, 0), jnp.float32),  # OIHW->HWIO
            jnp.asarray(scale, jnp.float32),
            jnp.asarray(shift, jnp.float32),
        )
    return params


def _bconv(x, params, name, stride=1, pad=None):
    """conv (no bias) + folded BN + relu.  ``pad``: (ph, pw); default is
    'same-for-odd-kernels' — callers pass explicit pads where torchvision
    deviates (VALID stems, stride-2 reductions)."""
    w, scale, shift = params[name]
    if pad is None:
        pad = ((w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2)
    x = jax.lax.conv_general_dilated(
        x, w, (stride, stride),
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(x * scale + shift)


def _max_pool(x, k=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _avg_pool_excl_pad(x, k=3):
    """3x3/s1/p1 average pool with ``count_include_pad=False`` — the
    pytorch-fid variant: border averages divide by the number of *valid*
    taps, not k*k."""
    window = (1, k, k, 1)
    strides = (1, 1, 1, 1)
    pads = [(0, 0), (1, 1), (1, 1), (0, 0)]
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides,
                                  pads)
    return s / count


def _block_a(x, p, prefix):
    b1 = _bconv(x, p, f"{prefix}.branch1x1")
    b5 = _bconv(x, p, f"{prefix}.branch5x5_1")
    b5 = _bconv(b5, p, f"{prefix}.branch5x5_2")
    b3 = _bconv(x, p, f"{prefix}.branch3x3dbl_1")
    b3 = _bconv(b3, p, f"{prefix}.branch3x3dbl_2")
    b3 = _bconv(b3, p, f"{prefix}.branch3x3dbl_3")
    bp = _bconv(_avg_pool_excl_pad(x), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b5, b3, bp], -1)


def _block_b(x, p, prefix):
    b3 = _bconv(x, p, f"{prefix}.branch3x3", stride=2, pad=(0, 0))
    bd = _bconv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _bconv(bd, p, f"{prefix}.branch3x3dbl_2")
    bd = _bconv(bd, p, f"{prefix}.branch3x3dbl_3", stride=2, pad=(0, 0))
    return jnp.concatenate([b3, bd, _max_pool(x)], -1)


def _block_c(x, p, prefix):
    b1 = _bconv(x, p, f"{prefix}.branch1x1")
    b7 = _bconv(x, p, f"{prefix}.branch7x7_1")
    b7 = _bconv(b7, p, f"{prefix}.branch7x7_2")
    b7 = _bconv(b7, p, f"{prefix}.branch7x7_3")
    bd = _bconv(x, p, f"{prefix}.branch7x7dbl_1")
    for i in (2, 3, 4, 5):
        bd = _bconv(bd, p, f"{prefix}.branch7x7dbl_{i}")
    bp = _bconv(_avg_pool_excl_pad(x), p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b7, bd, bp], -1)


def _block_d(x, p, prefix):
    b3 = _bconv(x, p, f"{prefix}.branch3x3_1")
    b3 = _bconv(b3, p, f"{prefix}.branch3x3_2", stride=2, pad=(0, 0))
    b7 = _bconv(x, p, f"{prefix}.branch7x7x3_1")
    b7 = _bconv(b7, p, f"{prefix}.branch7x7x3_2")
    b7 = _bconv(b7, p, f"{prefix}.branch7x7x3_3")
    b7 = _bconv(b7, p, f"{prefix}.branch7x7x3_4", stride=2, pad=(0, 0))
    return jnp.concatenate([b3, b7, _max_pool(x)], -1)


def _block_e(x, p, prefix, pool: str):
    b1 = _bconv(x, p, f"{prefix}.branch1x1")
    b3 = _bconv(x, p, f"{prefix}.branch3x3_1")
    b3 = jnp.concatenate([
        _bconv(b3, p, f"{prefix}.branch3x3_2a"),
        _bconv(b3, p, f"{prefix}.branch3x3_2b"),
    ], -1)
    bd = _bconv(x, p, f"{prefix}.branch3x3dbl_1")
    bd = _bconv(bd, p, f"{prefix}.branch3x3dbl_2")
    bd = jnp.concatenate([
        _bconv(bd, p, f"{prefix}.branch3x3dbl_3a"),
        _bconv(bd, p, f"{prefix}.branch3x3dbl_3b"),
    ], -1)
    pooled = (_max_pool(x, stride=1, pad=1) if pool == "max"
              else _avg_pool_excl_pad(x))
    bp = _bconv(pooled, p, f"{prefix}.branch_pool")
    return jnp.concatenate([b1, b3, bd, bp], -1)


def _forward(params, images01):
    """(B, 299, 299, 3) in [0, 1] -> (B, 2048) pool3 features."""
    x = images01 * 2.0 - 1.0
    x = _bconv(x, params, "Conv2d_1a_3x3", stride=2, pad=(0, 0))
    x = _bconv(x, params, "Conv2d_2a_3x3", pad=(0, 0))
    x = _bconv(x, params, "Conv2d_2b_3x3")
    x = _max_pool(x)
    x = _bconv(x, params, "Conv2d_3b_1x1")
    x = _bconv(x, params, "Conv2d_4a_3x3", pad=(0, 0))
    x = _max_pool(x)
    x = _block_a(x, params, "Mixed_5b")
    x = _block_a(x, params, "Mixed_5c")
    x = _block_a(x, params, "Mixed_5d")
    x = _block_b(x, params, "Mixed_6a")
    for name in ("Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e"):
        x = _block_c(x, params, name)
    x = _block_d(x, params, "Mixed_7a")
    x = _block_e(x, params, "Mixed_7b", pool="avg")
    x = _block_e(x, params, "Mixed_7c", pool="max")
    return x.mean(axis=(1, 2))


_forward_jit = jax.jit(_forward)


def inception_features(images01: np.ndarray, params, batch: int = 32
                       ) -> np.ndarray:
    """(N, H, W, 1|3) images in [0, 1] -> (N, 2048) features.

    Preprocessing mirrors torchmetrics(normalize=True) -> pytorch-fid:
    quantize to uint8 levels, bilinear resize to 299 (half-pixel /
    ``align_corners=False``), scale to [-1, 1] inside the net.
    """
    feats = []
    for s in range(0, len(images01), batch):
        x = jnp.asarray(images01[s:s + batch], jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        x = jnp.round(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, 3), method="bilinear")
        feats.append(np.asarray(_forward_jit(params, x)))
    return np.concatenate(feats, 0)
