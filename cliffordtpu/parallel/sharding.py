"""Parameter partition rules and sharded train steps.

Tensor-parallel rules target the transformer hot spots of CliffordARVAE:
attention q/k/v project *out* over the model axis (head-sharded), the
output projection contracts back (*in*-sharded), and SwiGLU's w1/w3 / w2
follow the Megatron column/row pattern.  Everything else (convs, norms,
heads) is replicated — the models are <= ~75M params so TP is bandwidth
relief, not a memory necessity (SURVEY.md §2.6).

XLA inserts the all-reduces over ICI; there is no hand-written collective
in the train step.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _rule_for_path(path: tuple) -> P:
    keys = [getattr(k, "key", str(k)) for k in path]
    joined = "/".join(keys)
    is_kernel = keys[-1] == "kernel"
    if not is_kernel:
        return P()
    if "Attention_0" in joined:
        if "wo" in keys:
            return P("model", None)  # fused layout: wo row parallel
        if "wqkv" in keys or any(f"Dense_{i}" in keys for i in (0, 1, 2)):
            # q/k/v column parallel.  The fused wqkv kernel is
            # head-interleaved ([q_h|k_h|v_h] per head), so a "model"
            # shard of its 3D output axis holds whole (q,k,v) head
            # triples — the reshape/split in Attention stays shard-local.
            return P(None, "model")
        return P("model", None)  # wo: row parallel
    if "SwiGLU_0" in joined:
        if "w2" in keys:
            return P("model", None)  # fused layout: w2 row parallel
        if "w13" in keys or "Dense_0" in keys or "Dense_1" in keys:
            # w1/w3 column parallel; the fused w13 kernel pairs (w1_i,
            # w3_i) in adjacent columns so silu(w1x)*w3x is shard-local.
            return P(None, "model")
        return P("model", None)  # w2
    return P()


def _fsdp_rule(path: tuple, leaf, mesh: Mesh, min_size: int = 2 ** 14) -> P:
    """ZeRO-3-style rule: shard each large leaf's largest divisible axis
    over the "data" mesh axis.  GSPMD then all-gathers a layer's weights
    just-in-time for its matmul and reduce-scatters its gradients — the
    standard FSDP schedule, expressed purely as a placement annotation.

    Small leaves (norm scales, biases, tiny heads) stay replicated: the
    gather latency would exceed the memory win (``min_size`` elements).
    """
    ndata = mesh.shape["data"]
    if not hasattr(leaf, "ndim") or leaf.ndim < 1 or leaf.size < min_size:
        return P()
    # TP rules take precedence on the transformer kernels (already sharded
    # over "model"); FSDP shards the remaining axis if divisible
    tp = _rule_for_path(path)
    dims = list(tp) + [None] * (leaf.ndim - len(tp))
    order = sorted(range(leaf.ndim), key=lambda a: -leaf.shape[a])
    for ax in order:
        if dims[ax] is None and leaf.shape[ax] % ndata == 0:
            dims[ax] = "data"
            return P(*dims)
    return P(*dims)


def infer_param_sharding(mesh: Mesh, params: Any, mode: str = "replicated",
                         fsdp_min_size: int = 2 ** 14):
    """NamedSharding pytree for a param pytree.

    ``mode``: "replicated" (DP+TP; params replicated over "data") or
    "fsdp" (additionally shard every large leaf over "data" — ZeRO-3).
    ``fsdp_min_size``: element-count cutoff below which a leaf stays
    replicated under fsdp (gather latency beats the memory win).
    """
    if mode == "fsdp":
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh, _fsdp_rule(path, leaf, mesh, fsdp_min_size)),
            params,
        )
    # TP rules target the standard 2-D Dense kernels; layer-stacked
    # (scan_layers) 3-D kernels stay replicated — stack TP support would
    # need P(None, None, "model") rules, unneeded at current model sizes
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh,
            _rule_for_path(path)
            if getattr(leaf, "ndim", 0) == 2 else P()),
        params,
    )


def shard_params(mesh: Mesh, params: Any, mode: str = "replicated"):
    return jax.device_put(params, infer_param_sharding(mesh, params, mode))


def shard_state(mesh: Mesh, state, mode: str = "replicated",
                fsdp_min_size: int = 2 ** 14):
    """Place a TrainState on the mesh: params + opt_state follow the rules.

    With ``mode="fsdp"`` the Adam moments are sharded exactly like their
    parameters, so optimizer memory scales down with the data axis too.
    """
    p_shard = infer_param_sharding(mesh, state.params, mode, fsdp_min_size)
    params = jax.device_put(state.params, p_shard)

    def shard_like(tree):
        # optimizer moments mirror the param tree structure where possible
        def place(path, leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1:
                try:
                    rule = (_fsdp_rule(path, leaf, mesh, fsdp_min_size)
                            if mode == "fsdp" else
                            (_rule_for_path(path) if leaf.ndim == 2
                             else P()))
                    return jax.device_put(leaf, NamedSharding(mesh, rule))
                except Exception:
                    pass
            return jax.device_put(leaf, NamedSharding(mesh, P()))

        return jax.tree_util.tree_map_with_path(place, tree)

    opt_state = shard_like(state.opt_state)
    return state.replace(params=params, opt_state=opt_state)


def make_sharded_cnn_train_step(model, mesh: Mesh):
    """DP(+TP) train step: batch sharded over "data", params per rules.

    Identical math to ``train.loop.make_cnn_train_step``; the only
    difference is sharding constraints, so single-chip and multi-chip runs
    produce the same loss for the same global batch.
    """
    from cliffordtpu.nn.conv_vae import cnn_vae_loss

    batch_sharding = NamedSharding(mesh, P("data", None, None, None))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, key, beta):
        x = jax.lax.with_sharding_constraint(x, batch_sharding)

        def loss_fn(params):
            x_recon, q_z, p_z, _ = model.apply(
                {"params": params}, x, rngs={"sample": key}
            )
            sigmas = (None, None)
            if model.use_learnable_beta:
                sigmas = (
                    jnp.exp(params["log_sigma_0"]),
                    jnp.exp(params["log_sigma_1"]),
                )
            losses = cnn_vae_loss(
                x, x_recon, q_z, p_z, model.distribution, beta=beta,
                recon_loss_type=model.recon_loss_type,
                l1_weight=model.l1_weight, sigmas=sigmas,
            )
            return losses["total_loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        losses["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, losses

    return train_step
