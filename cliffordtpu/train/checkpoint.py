"""Checkpointing — orbax rebuild of the torch.save best-model flow.

Reference semantics preserved (``cnn/fashion_train.py:867-875, 1217-1224``):
save the best model per trial, reload before eval, delete after eval unless
``--keep_ckpts``.  Unlike the reference (weights only, ``torch.save``),
checkpoints here carry params, opt_state, step, best metric and the RNG key
so mid-sweep resume is possible.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np

_CKPT_NAME = "best_model.ckpt"

# v1 (implicit, no tag): ViT Attention q/k kernels stored in the interleaved
#     RoPE pair layout consumed by ``vit_vae.apply_rotary``.
# v2: q/k kernels stored in the half-split layout consumed by
#     ``vit_vae.apply_rotary_half`` (pair i = (i, i + hd/2)).  Loading a v1
#     checkpoint permutes q/k columns (and the matching adam moments) so old
#     checkpoints keep computing identical attention under the new kernel.
# v2 + "proj_layout" tag: records whether ViT q/k/v and SwiGLU w1/w3 live
#     as separate Dense kernels ("split") or as the fused wqkv/w13 kernels
#     ("fused", ``vit_vae`` fused_proj=True).  The tag is derived from the
#     param tree itself, so untagged v2 checkpoints load fine; loading into
#     a model with the other layout rearranges params + adam moments
#     exactly (``nn.param_convert``).
CKPT_FORMAT_VERSION = 2
ROPE_LAYOUT = "half"


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def model_n_heads(model) -> Optional[int]:
    """Attention head count of a ViT-bearing model (None when no ViT).

    Mirrors ``CliffordARVAE.setup``: n_heads = max(1, z_channels // 64)
    (reference ``cnn/cliffordar_model.py:425``).
    """
    cfg_fn = getattr(model, "_cfg", None)
    if cfg_fn is None:
        return None
    try:
        return max(1, int(cfg_fn()["z_channels"]) // 64)
    except Exception:
        return None


def _rope_half_perm(out_dim: int, n_heads: int) -> np.ndarray:
    """Column permutation interleaved-pair -> half-split (per head)."""
    hd = out_dim // n_heads
    idx = np.arange(out_dim).reshape(n_heads, hd)
    return np.concatenate([idx[:, 0::2], idx[:, 1::2]], axis=1).reshape(-1)


def _migrate_rope_layout(tree: Any, n_heads: int) -> int:
    """Permute every ``Attention_*/Dense_{0,1}/kernel`` (q/k projections)
    in-place from interleaved to half-split layout.  Works on any nested
    dict mirroring the param structure — including restored adam ``mu``/
    ``nu`` moment trees, which are elementwise and therefore migrate with
    the identical permutation.  Returns the number of kernels permuted."""
    if isinstance(tree, (list, tuple)):
        return sum(_migrate_rope_layout(sub, n_heads) for sub in tree)
    if not isinstance(tree, dict):
        return 0
    n = 0
    for key, sub in tree.items():
        if str(key).startswith("Attention_") and isinstance(sub, dict):
            for dense in ("Dense_0", "Dense_1"):  # q, k projections
                kern = sub.get(dense, {}).get("kernel") if isinstance(
                    sub.get(dense), dict) else None
                if kern is not None and np.ndim(kern) >= 2:
                    # last axis = output features; a leading layer axis
                    # (scan_layers-stacked 3-D kernels) permutes the same
                    # way, matching param_convert's layout handling
                    perm = _rope_half_perm(np.shape(kern)[-1], n_heads)
                    sub[dense]["kernel"] = np.asarray(kern)[..., perm]
                    n += 1
        n += _migrate_rope_layout(sub, n_heads)
    return n


def _has_attention_kernels(tree: Any) -> bool:
    if isinstance(tree, (list, tuple)):
        return any(_has_attention_kernels(v) for v in tree)
    if not isinstance(tree, dict):
        return False
    return any(
        str(k).startswith("Attention_") or _has_attention_kernels(v)
        for k, v in tree.items()
    )


def save_checkpoint(output_dir: str, state, step: int = 0,
                    best_metric: float = 0.0, rng_key=None) -> str:
    """Save (params, opt_state, step, best_metric, key) under output_dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, _CKPT_NAME))
    if os.path.exists(path):
        shutil.rmtree(path)
    from cliffordtpu.nn.param_convert import detect_proj_layout

    params_host = _to_host(state.params)
    payload = {
        "params": params_host,
        "opt_state": _to_host(state.opt_state),
        "step": step,
        "best_metric": float(best_metric),
        "format_version": CKPT_FORMAT_VERSION,
        "rope_layout": ROPE_LAYOUT,
        "proj_layout": detect_proj_layout(params_host),
    }
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload)
    return path


def load_checkpoint(output_dir: str,
                    n_heads: Optional[int] = None,
                    fused_proj: Optional[bool] = None) -> Optional[Any]:
    """Restore a checkpoint, migrating pre-v2 ViT RoPE layouts.

    ``n_heads``: attention head count of the model the params belong to
    (``model_n_heads(model)``); required only when restoring a legacy
    (untagged) checkpoint that contains Attention kernels, or when a
    projection-layout conversion is needed.
    ``fused_proj``: the layout the receiving model expects (its
    ``fused_proj`` flag).  When given and the stored layout differs, the
    params and adam moments are rearranged exactly (``nn.param_convert``)
    so either layout can load the other's checkpoints.  ``None`` skips the
    check (caller takes the stored layout as-is).
    """
    import orbax.checkpoint as ocp

    from cliffordtpu.nn.param_convert import (
        detect_proj_layout, fuse_vit_params, unfuse_vit_params)

    path = os.path.abspath(os.path.join(output_dir, _CKPT_NAME))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    layout = payload.get("rope_layout") if isinstance(payload, dict) else None
    if layout is None and isinstance(payload, dict) and \
            _has_attention_kernels(payload.get("params", {})):
        if n_heads is None:
            raise ValueError(
                f"{path} is a pre-v2 checkpoint with ViT attention kernels "
                "in the legacy interleaved RoPE layout; pass n_heads="
                "model_n_heads(model) to load_checkpoint so the q/k kernels "
                "can be migrated to the half-split layout."
            )
        n = _migrate_rope_layout(payload.get("params", {}), n_heads)
        n += _migrate_rope_layout(payload.get("opt_state", {}), n_heads)
        print(f"checkpoint: migrated {n} q/k kernels (+moments) from "
              f"interleaved to half-split RoPE layout ({path})")
        payload["rope_layout"] = ROPE_LAYOUT
        payload["format_version"] = CKPT_FORMAT_VERSION
    if fused_proj is not None and isinstance(payload, dict):
        stored = payload.get("proj_layout")
        if stored is None:
            stored = detect_proj_layout(payload.get("params", {}))
        want = "fused" if fused_proj else "split"
        if stored != "none" and stored != want:
            if n_heads is None:
                raise ValueError(
                    f"{path} stores ViT projections in the '{stored}' "
                    f"layout but the model expects '{want}'; pass n_heads="
                    "model_n_heads(model) so the kernels can be converted."
                )
            conv = fuse_vit_params if fused_proj else unfuse_vit_params
            n = conv(payload.get("params", {}), n_heads)
            n += conv(payload.get("opt_state", {}), n_heads)
            print(f"checkpoint: converted {n} attention/SwiGLU modules "
                  f"(+moments) from '{stored}' to '{want}' projection "
                  f"layout ({path})")
            payload["proj_layout"] = want
    return payload


def delete_checkpoint(output_dir: str) -> None:
    """Delete-after-eval (``fashion_train.py:1217-1224``)."""
    path = os.path.join(output_dir, _CKPT_NAME)
    if os.path.exists(path):
        try:
            shutil.rmtree(path)
        except OSError as e:
            print(f"warning: failed to delete {path}: {e}")
