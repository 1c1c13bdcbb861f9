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


def _to_host(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def save_checkpoint(output_dir: str, state, step: int = 0,
                    best_metric: float = 0.0, rng_key=None) -> str:
    """Save (params, opt_state, step, best_metric, key) under output_dir."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, _CKPT_NAME))
    if os.path.exists(path):
        shutil.rmtree(path)
    payload = {
        "params": _to_host(state.params),
        "opt_state": _to_host(state.opt_state),
        "step": step,
        "best_metric": float(best_metric),
    }
    if rng_key is not None:
        payload["rng_key"] = np.asarray(rng_key)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload)
    return path


def load_checkpoint(output_dir: str) -> Optional[Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, _CKPT_NAME))
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(path)


def delete_checkpoint(output_dir: str) -> None:
    """Delete-after-eval (``fashion_train.py:1217-1224``)."""
    path = os.path.join(output_dir, _CKPT_NAME)
    if os.path.exists(path):
        try:
            shutil.rmtree(path)
        except OSError as e:
            print(f"warning: failed to delete {path}: {e}")
