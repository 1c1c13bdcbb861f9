"""Train state construction: optimizer chains matching the reference.

* MNIST runners: Adam(lr) + global grad-norm clip 1.0
  (``mnist/mnist_clifpws.py:260,278``).
* CNN runners: AdamW(lr) + clip 1.0, with a 0.1x lr parameter group for the
  learnable-beta log-sigmas (``cnn/fashion_train.py:826-832``, ``:66-68``).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def _is_sigma(path_tuple) -> bool:
    return any("log_sigma" in str(k) for k in path_tuple)


def make_optimizer(
    optimizer: str = "adam",
    lr: float = 1e-3,
    clip_norm: float = 1.0,
    sigma_lr_scale: float | None = None,
    params: Any = None,
):
    def base(lr_):
        if optimizer == "adam":
            return optax.adam(lr_)
        elif optimizer == "adamw":
            return optax.adamw(lr_)
        raise ValueError(optimizer)

    if sigma_lr_scale is None:
        tx = base(lr)
    else:
        # learnable-beta sigmas train at lr * sigma_lr_scale
        labels = jax.tree_util.tree_map_with_path(
            lambda path, _: "sigma" if _is_sigma(path) else "main", params
        )
        tx = optax.multi_transform(
            {"main": base(lr), "sigma": base(lr * sigma_lr_scale)}, labels
        )
    return optax.chain(optax.clip_by_global_norm(clip_norm), tx)


def create_train_state(
    key,
    model,
    example_input,
    optimizer: str = "adam",
    lr: float = 1e-3,
    clip_norm: float = 1.0,
    sigma_lr_scale: float | None = None,
) -> TrainState:
    init_key, sample_key = jax.random.split(key)
    variables = model.init(
        {"params": init_key, "sample": sample_key}, example_input
    )
    params = variables["params"]
    tx = make_optimizer(optimizer, lr, clip_norm, sigma_lr_scale, params)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
