"""Jitted train/eval steps and a fit loop with early stopping.

The reference trains with a per-batch Python loop calling
``loss.backward()`` (``mnist/mnist_clifpws.py:268-312``); here each step is
one compiled XLA program (donated state, keyed sampling, beta as a traced
scalar so schedule changes don't recompile).
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from cliffordtpu.data.loaders import binarize_with_random_threshold
from cliffordtpu.nn.losses import vae_loss_from_outputs


def make_mlp_train_step(model, binarize: bool = True):
    """Train step for MLPVAE-family models (BCE ELBO)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, key, beta):
        k_bin, k_sample = jax.random.split(key)
        if binarize:
            x = binarize_with_random_threshold(k_bin, x)

        def loss_fn(params):
            outputs = model.apply(
                {"params": params}, x, rngs={"sample": k_sample}
            )
            losses = vae_loss_from_outputs(x, outputs, beta)
            return losses["total"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        losses["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, losses

    return train_step


def make_mlp_eval_step(model, binarize: bool = True):
    @jax.jit
    def eval_step(params, x, key, beta):
        k_bin, k_sample = jax.random.split(key)
        if binarize:
            x = binarize_with_random_threshold(k_bin, x)
        outputs = model.apply({"params": params}, x, rngs={"sample": k_sample})
        return vae_loss_from_outputs(x, outputs, beta)

    return eval_step


def make_cnn_train_step(model):
    """Train step for CNNVAE / CliffordARVAE / HybridVAE (l1|mse ELBO,
    ``cnn/fashion_train.py:53-68`` semantics: loss -> clip 1.0 -> AdamW)."""
    from cliffordtpu.nn.conv_vae import cnn_vae_loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, x, key, beta):
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
        # pre-clip global grad norm: the JAX stand-in for torch
        # ``wandb.watch(model, log="gradients")`` (wandb_utils.py:306-310)
        # — free, XLA CSEs it with the clip's own norm computation
        losses["grad_norm"] = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        return state, losses

    return train_step


def make_cnn_eval_step(model):
    from cliffordtpu.nn.conv_vae import cnn_vae_loss

    @jax.jit
    def eval_step(params, x, key, beta):
        x_recon, q_z, p_z, _ = model.apply(
            {"params": params}, x, rngs={"sample": key}
        )
        sigmas = (None, None)
        if model.use_learnable_beta:
            sigmas = (
                jnp.exp(params["log_sigma_0"]),
                jnp.exp(params["log_sigma_1"]),
            )
        return cnn_vae_loss(
            x, x_recon, q_z, p_z, model.distribution, beta=beta,
            recon_loss_type=model.recon_loss_type,
            l1_weight=model.l1_weight, sigmas=sigmas,
        )

    return eval_step


def fit(
    state,
    train_step,
    eval_step,
    key,
    x_train: np.ndarray,
    x_val: np.ndarray,
    *,
    epochs: int,
    batch_size: int,
    beta_fn: Callable[[int], float],
    patience: int = 50,
    log_fn: Optional[Callable[[int, Dict], None]] = None,
    epoch_step=None,
) -> Tuple[object, Dict]:
    """Epoch loop with val early-stopping and best-params restore
    (``mnist/mnist_clifpws.py:268-318`` semantics).

    ``epoch_step`` (from ``make_mlp_epoch_step``): run each epoch as ONE
    scanned XLA program instead of a per-step Python loop — on a slow host
    per-step dispatch dominates (~20 ms host vs ~2 ms device on v5e), so
    this recovers device-bound throughput.  Same key stream as the
    per-step path, so losses match (``test_train.py``)."""
    n = x_train.shape[0]
    steps = max(1, n // batch_size)
    best_val = float("inf")
    best_params = jax.tree_util.tree_map(lambda a: a.copy(),
                                         state.params)
    patience_counter = 0
    history = {"train_loss": [], "val_loss": []}

    for epoch in range(epochs):
        beta = jnp.asarray(beta_fn(epoch), jnp.float32)
        ekey = jax.random.fold_in(key, epoch)
        perm = np.asarray(jax.random.permutation(
            jax.random.fold_in(ekey, 0), n))
        if epoch_step is not None:
            batches = stack_epoch_batches(x_train, perm, steps, batch_size)
            state, ep_losses = epoch_step(state, batches, ekey, beta)
            ep_loss = float(ep_losses["total"].mean())
            ep_gnorm = float(ep_losses["grad_norm"].mean())
        else:
            ep_loss_dev = ep_gnorm_dev = None
            for s in range(steps):
                xb = jnp.asarray(
                    x_train[perm[s * batch_size:(s + 1) * batch_size]])
                skey = jax.random.fold_in(ekey, s + 1)
                state, losses = train_step(state, xb, skey, beta)
                # accumulate on device: one D2H transfer per epoch
                ep_loss_dev = (losses["total"] if ep_loss_dev is None
                               else ep_loss_dev + losses["total"])
                gn = losses.get("grad_norm")
                if gn is not None:
                    ep_gnorm_dev = (gn if ep_gnorm_dev is None
                                    else ep_gnorm_dev + gn)
            ep_loss = float(ep_loss_dev) / steps
            ep_gnorm = (float(ep_gnorm_dev) / steps
                        if ep_gnorm_dev is not None else float("nan"))

        # validation
        vkey = jax.random.fold_in(ekey, 10_000)
        v_losses = []
        for s in range(0, x_val.shape[0], batch_size):
            xb = jnp.asarray(x_val[s:s + batch_size])
            v = eval_step(state.params, xb, jax.random.fold_in(vkey, s), beta)
            v_losses.append(float(v["total"]) * xb.shape[0])
        val_loss = sum(v_losses) / x_val.shape[0]

        history["train_loss"].append(ep_loss)
        history["val_loss"].append(val_loss)
        if log_fn:
            # grad_norm: the JAX stand-in for wandb.watch gradient logs
            log_fn(epoch, {"train_loss": ep_loss, "val_loss": val_loss,
                           "grad_norm": ep_gnorm, "beta": float(beta)})

        if np.isfinite(val_loss) and val_loss < best_val:
            best_val = val_loss
            # deep copy: the next train_step DONATES state.params buffers
            # (no-op on CPU, buffer-invalidating on TPU)
            best_params = jax.tree_util.tree_map(
                lambda a: a.copy(), state.params)
            patience_counter = 0
        else:
            patience_counter += 1
            if patience_counter >= patience:
                break

    state = state.replace(params=best_params)
    history["best_val"] = best_val
    return state, history


def make_mlp_epoch_step(model, binarize: bool = True):
    """One jitted program per EPOCH: lax.scan over the minibatch axis.

    TPU-first alternative to the per-step Python loop: on a slow host the
    per-step dispatch dominates (measured ~20 ms/step vs ~2 ms device time
    on v5e), so scanning the whole epoch recovers device-bound throughput.
    ``batches``: (S, B, ...) stacked minibatches.
    """

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state, batches, key, beta):
        def body(state, inp):
            i, xb = inp
            # fold i+1: the exact key stream of the per-step path in
            # fit() (skey = fold_in(ekey, s+1)), so scan == loop
            skey = jax.random.fold_in(key, i + 1)
            k_bin, k_sample = jax.random.split(skey)
            if binarize:
                xb = binarize_with_random_threshold(k_bin, xb)

            def loss_fn(params):
                outputs = model.apply(
                    {"params": params}, xb, rngs={"sample": k_sample}
                )
                losses = vae_loss_from_outputs(xb, outputs, beta)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
            losses["grad_norm"] = optax.global_norm(grads)
            return state.apply_gradients(grads=grads), losses

        S = batches.shape[0]
        state, losses = jax.lax.scan(
            body, state, (jnp.arange(S), batches))
        return state, losses  # losses: dict of (S,) arrays

    return epoch_step


def make_cnn_epoch_step(model):
    """Epoch-scanned train program for the CNN/ViT families."""
    from cliffordtpu.nn.conv_vae import cnn_vae_loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def epoch_step(state, batches, key, beta):
        def body(state, inp):
            i, xb = inp
            # fold i+1: the exact key stream of the per-step path in
            # cnn_runner.train_model (fold_in(ekey, s+1)), so scan == loop
            skey = jax.random.fold_in(key, i + 1)

            def loss_fn(params):
                x_recon, q_z, p_z, _ = model.apply(
                    {"params": params}, xb, rngs={"sample": skey}
                )
                sigmas = (None, None)
                if model.use_learnable_beta:
                    sigmas = (
                        jnp.exp(params["log_sigma_0"]),
                        jnp.exp(params["log_sigma_1"]),
                    )
                losses = cnn_vae_loss(
                    xb, x_recon, q_z, p_z, model.distribution, beta=beta,
                    recon_loss_type=model.recon_loss_type,
                    l1_weight=model.l1_weight, sigmas=sigmas,
                )
                return losses["total_loss"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
            losses["grad_norm"] = optax.global_norm(grads)
            return state.apply_gradients(grads=grads), losses

        S = batches.shape[0]
        state, losses = jax.lax.scan(
            body, state, (jnp.arange(S), batches))
        return state, losses  # losses: dict of (S,) arrays

    return epoch_step


def stack_trial_states(states):
    """Stack T same-model TrainStates into one batched state (leading
    trial axis on every array leaf).  Static fields (apply_fn, tx) are
    taken from trial 0 — each create_train_state builds its own optax
    chain object, and those compare unequal as pytree aux data even when
    identically configured."""
    s0 = states[0]
    step, params, opt_state = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs),
        *[(s.step, s.params, s.opt_state) for s in states])
    return s0.replace(step=step, params=params, opt_state=opt_state)


def index_trial_state(states, t: int):
    """Extract trial t's TrainState from a stacked state."""
    return jax.tree_util.tree_map(lambda a: a[t], states)


def make_mlp_trials_programs(model, x_train, x_val, batch_size: int,
                             binarize: bool = True):
    """Batched-trial training programs: T independent (state, key) lanes
    advance one epoch in ONE XLA program (``jax.vmap`` over the trial
    axis around the epoch ``lax.scan``).

    TPU-first capability the reference cannot express: its headline
    sweeps train n_runs=20 trials SEQUENTIALLY per (distribution, d) cell
    (``mnist/mnist_clifpws.py:252-318``); at MLP sizes one trial leaves
    the MXU nearly idle, so batching trials multiplies throughput at
    almost no cost.  The data never leaves the device: the train set is
    device-resident and each lane draws its own permutation IN-PROGRAM
    from the exact key stream of ``fit()`` (perm from fold_in(ekey, 0),
    step keys fold_in(ekey, s+1)), so per-lane results equal the
    sequential path (tests/test_train.py).
    """
    x_train_dev = jnp.asarray(x_train)
    x_val_dev = jnp.asarray(x_val)
    n = x_train.shape[0]
    # fit() trains one SHORT batch when n < batch_size (numpy slice);
    # static shapes need the effective TRAIN batch capped to n to match.
    # Val chunking below keeps the caller's batch_size so the val key
    # stream (fold_in(vkey, s) at s = 0, batch_size, ...) stays identical.
    train_bs = min(batch_size, n)
    steps = max(1, n // train_bs)

    def epoch(state, ekey, beta):
        perm = jax.random.permutation(jax.random.fold_in(ekey, 0), n)
        ids = perm[: steps * train_bs].reshape(steps, train_bs)

        def body(state, inp):
            i, batch_ids = inp
            xb = jnp.take(x_train_dev, batch_ids, axis=0)
            skey = jax.random.fold_in(ekey, i + 1)
            k_bin, k_sample = jax.random.split(skey)
            if binarize:
                xb = binarize_with_random_threshold(k_bin, xb)

            def loss_fn(params):
                outputs = model.apply(
                    {"params": params}, xb, rngs={"sample": k_sample}
                )
                losses = vae_loss_from_outputs(xb, outputs, beta)
                return losses["total"], losses

            grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
            losses["grad_norm"] = optax.global_norm(grads)
            return state.apply_gradients(grads=grads), losses

        return jax.lax.scan(body, state, (jnp.arange(steps), ids))

    epoch_trials = jax.jit(
        jax.vmap(epoch, in_axes=(0, 0, None)), donate_argnums=(0,))

    def val_batch(params, xb, key, beta):
        k_bin, k_sample = jax.random.split(key)
        if binarize:
            xb = binarize_with_random_threshold(k_bin, xb)
        outputs = model.apply({"params": params}, xb,
                              rngs={"sample": k_sample})
        return vae_loss_from_outputs(xb, outputs, beta)["total"]

    eval_trials = jax.jit(jax.vmap(val_batch, in_axes=(0, None, 0, None)))

    def val_loss_trials(params, vkeys, beta):
        tot = None
        for s in range(0, x_val.shape[0], batch_size):
            xb = x_val_dev[s: s + batch_size]
            ks = jax.vmap(lambda k: jax.random.fold_in(k, s))(vkeys)
            v = eval_trials(params, xb, ks, beta) * xb.shape[0]
            tot = v if tot is None else tot + v
        return np.asarray(tot) / x_val.shape[0]

    return epoch_trials, val_loss_trials


def fit_trials(
    states,
    keys,
    x_train: np.ndarray,
    x_val: np.ndarray,
    model,
    *,
    epochs: int,
    batch_size: int,
    beta_fn: Callable[[int], float],
    patience: int = 50,
    binarize: bool = True,
    log_fn: Optional[Callable[[int, Dict], None]] = None,
):
    """``fit`` semantics for T trials at once (stacked ``states``, per-
    trial ``keys`` of shape (T, 2)).

    Early stopping is per-lane: a lane whose patience runs out keeps
    computing (lanes march in lock-step) but its best-checkpoint tracking
    and history FREEZE at the stopping epoch, so each lane's
    (best_params, best_val, history) equal the sequential ``fit()``'s.
    The loop exits once every lane has stopped.  Returns (stacked states
    with per-lane best params restored, list of T per-trial histories).
    """
    T = len(keys)
    keys = jnp.asarray(keys)
    epoch_trials, val_loss_trials = make_mlp_trials_programs(
        model, x_train, x_val, batch_size, binarize=binarize)

    best_val = np.full(T, np.inf)
    best_params = jax.tree_util.tree_map(lambda a: a.copy(), states.params)
    patience_ctr = np.zeros(T, np.int64)
    stopped = np.zeros(T, bool)
    histories = [{"train_loss": [], "val_loss": []} for _ in range(T)]

    for epoch in range(epochs):
        beta = jnp.asarray(beta_fn(epoch), jnp.float32)
        ekeys = jax.vmap(lambda k: jax.random.fold_in(k, epoch))(keys)
        states, ep_losses = epoch_trials(states, ekeys, beta)
        ep_loss = np.asarray(ep_losses["total"].mean(axis=1))
        ep_gnorm = np.asarray(ep_losses["grad_norm"].mean(axis=1))
        vkeys = jax.vmap(lambda k: jax.random.fold_in(k, 10_000))(ekeys)
        val_loss = val_loss_trials(states.params, vkeys, beta)

        active = ~stopped
        for t in np.nonzero(active)[0]:
            histories[t]["train_loss"].append(float(ep_loss[t]))
            histories[t]["val_loss"].append(float(val_loss[t]))
        if log_fn:
            log_fn(epoch, {"train_loss": float(ep_loss[active].mean()),
                           "val_loss": float(val_loss[active].mean()),
                           "grad_norm": float(ep_gnorm[active].mean()),
                           "beta": float(beta),
                           "active_trials": int(active.sum())})

        improved = active & np.isfinite(val_loss) & (val_loss < best_val)
        if improved.any():
            sel = jnp.asarray(improved)
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(
                    sel.reshape((T,) + (1,) * (p.ndim - 1)), p, b),
                best_params, states.params)
            best_val = np.where(improved, val_loss, best_val)
        patience_ctr = np.where(improved, 0,
                                patience_ctr + active.astype(np.int64))
        stopped = stopped | (patience_ctr >= patience)
        if stopped.all():
            break

    states = states.replace(params=best_params)
    for t in range(T):
        histories[t]["best_val"] = float(best_val[t])
    return states, histories


def stack_epoch_batches(x_train, perm, steps: int, batch_size: int):
    """(S*B indices) -> (S, B, ...) device-ready stack for an epoch scan.

    The tail (n % batch_size) is dropped, exactly like the per-step paths
    (steps = n // batch_size)."""
    idx = perm[:steps * batch_size]
    return jnp.asarray(
        x_train[idx].reshape(steps, batch_size, *x_train.shape[1:]))
