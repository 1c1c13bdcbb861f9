"""Train state construction: optimizer chains matching the reference.

* MNIST runners: Adam(lr) + global grad-norm clip 1.0
  (``mnist/mnist_clifpws.py:260,278``).
* CNN runners: AdamW(lr) + clip 1.0, with a 0.1x lr parameter group for the
  learnable-beta log-sigmas (``cnn/fashion_train.py:826-832``, ``:66-68``).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    pass


def _is_sigma(path_tuple) -> bool:
    return any("log_sigma" in str(k) for k in path_tuple)


class FusedAdamState(NamedTuple):
    count: jnp.ndarray  # int32 step counter
    m: jnp.ndarray      # first moment, flat
    v: jnp.ndarray      # second moment, flat
    lr_scale: jnp.ndarray  # per-element lr multiplier, flat (all-ones
    # unless a learnable-beta sigma group is present)


def fused_adam(lr, clip_norm=None, b1=0.9, b2=0.999, eps=1e-8,
               weight_decay=0.0, sigma_lr_scale=None):
    """Adam(W) + global-norm clip over ONE flat parameter vector.

    Mathematically identical to ``optax.chain(clip_by_global_norm, adam[w])``
    (asserted by tests/test_train.py), but executes as a handful of large
    fused ops instead of ~8 ops per parameter leaf: on a 160-leaf model the
    per-leaf chain is >1k tiny device ops per step, which dominates the
    profile on TPU (each ~5-15 us).  The flat layout turns the global-norm
    reduce, moment updates and parameter update into single full-width
    kernels.
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        if sigma_lr_scale is None:
            scale = jnp.ones((), flat.dtype)  # scalar broadcast: no extra HBM
        else:
            scale_tree = jax.tree_util.tree_map_with_path(
                lambda path, p: jnp.full(
                    p.shape,
                    sigma_lr_scale if _is_sigma(path) else 1.0,
                    flat.dtype),
                params)
            scale = ravel_pytree(scale_tree)[0]
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            m=jnp.zeros_like(flat), v=jnp.zeros_like(flat), lr_scale=scale)

    def update(updates, state, params=None):
        g, unravel = ravel_pytree(updates)
        if clip_norm is not None:
            # mirror optax.clip_by_global_norm's where-form exactly
            g_norm = jnp.sqrt(jnp.sum(g * g))
            g = jnp.where(g_norm < clip_norm, g, g * (clip_norm / g_norm))
        count = state.count + 1
        m = b1 * state.m + (1.0 - b1) * g
        v = b2 * state.v + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        m_hat = m / (1.0 - b1 ** c)
        v_hat = v / (1.0 - b2 ** c)
        u = m_hat / (jnp.sqrt(v_hat) + eps)
        if weight_decay:
            if params is None:
                raise ValueError("adamw requires params")
            u = u + weight_decay * ravel_pytree(params)[0]
        u = (-lr * state.lr_scale) * u
        return unravel(u), FusedAdamState(count, m, v, state.lr_scale)

    return optax.GradientTransformation(init, update)


def make_optimizer(
    optimizer: str = "adam",
    lr: float = 1e-3,
    clip_norm: float = 1.0,
    sigma_lr_scale: float | None = None,
    params: Any = None,
):
    if optimizer in ("adam_fused", "adamw_fused"):
        # weight decay 1e-4 == optax.adamw's default (the unfused path)
        return fused_adam(
            lr, clip_norm=clip_norm,
            weight_decay=1e-4 if optimizer == "adamw_fused" else 0.0,
            sigma_lr_scale=sigma_lr_scale)

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
    accum_steps: int = 1,
) -> TrainState:
    """``accum_steps > 1`` wraps the optimizer in ``optax.MultiSteps``:
    gradients are AVERAGED over that many microbatch steps and the inner
    update (incl. the global-norm clip, so clip-on-mean == big-batch
    semantics) fires once per cycle — effective batch = accum_steps x
    microbatch.  The reference has no equivalent (single-device, batch
    always fits); this exists for large-model / large-batch production
    training where the per-step batch is memory-capped."""
    init_key, sample_key = jax.random.split(key)
    # model.init MUST run under jit: eagerly it dispatches thousands of tiny
    # ops one by one, and on the axon TPU tunnel each is an RPC — measured
    # 153 s of the 155 s flagship32 "compile+warmup" (the train step itself
    # is persistent-cache-hit in ~8 s).  Jitted, init is one compiled
    # program that also lands in the persistent cache.
    variables = jax.jit(model.init)(
        {"params": init_key, "sample": sample_key}, example_input
    )
    params = variables["params"]
    tx = make_optimizer(optimizer, lr, clip_norm, sigma_lr_scale, params)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accum_steps))
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)
