"""Train-loop mechanics: early stopping, best-params restore, checkpoint
round-trip, NaN guard."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.nn import MLPVAE
from cliffordtpu.train.checkpoint import (
    delete_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from cliffordtpu.train.loop import fit, make_mlp_eval_step, make_mlp_train_step
from cliffordtpu.train.state import create_train_state
from cliffordtpu.utils.profiling import NaNLossError, nan_guard

KEY = jax.random.PRNGKey(0)


def _setup():
    model = MLPVAE(h_dim=128, z_dim=4, distribution="normal")
    state = create_train_state(KEY, model, jnp.zeros((2, 784)), lr=1e-3)
    return model, state


def test_fit_trains_and_restores_best():
    model, state = _setup()
    x = np.random.default_rng(0).uniform(0, 1, (128, 784)).astype(np.float32)
    state, hist = fit(
        state, make_mlp_train_step(model), make_mlp_eval_step(model),
        KEY, x[:96], x[96:], epochs=3, batch_size=32,
        beta_fn=lambda e: 1.0, patience=50,
    )
    assert len(hist["train_loss"]) == 3
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert np.isfinite(hist["best_val"])


def test_fit_early_stops():
    model, state = _setup()
    x = np.random.default_rng(0).uniform(0, 1, (64, 784)).astype(np.float32)
    # scripted eval: val loss strictly increases -> stop at 1 + patience
    epoch_counter = {"n": -1}

    def scripted_eval(params, xb, key, beta):
        return {"total": jnp.asarray(100.0 + epoch_counter["n"])}

    real_train = make_mlp_train_step(model)

    def counting_train(state, xb, key, beta):
        return real_train(state, xb, key, beta)

    def beta_fn(e):
        epoch_counter["n"] = e
        return 1.0

    state, hist = fit(
        state, counting_train, scripted_eval,
        KEY, x[:48], x[48:], epochs=50, batch_size=16,
        beta_fn=beta_fn, patience=2,
    )
    assert len(hist["train_loss"]) == 3  # epoch 0 best, 1-2 no improvement


def test_checkpoint_roundtrip(tmp_path):
    model, state = _setup()
    path = save_checkpoint(str(tmp_path), state, step=7, best_metric=1.23)
    restored = load_checkpoint(str(tmp_path))
    assert restored["step"] == 7
    assert abs(restored["best_metric"] - 1.23) < 1e-9
    leaves_a = jax.tree_util.tree_leaves(state.params)
    leaves_b = jax.tree_util.tree_leaves(restored["params"])
    assert len(leaves_a) == len(leaves_b)
    np.testing.assert_allclose(np.asarray(leaves_a[0]),
                               np.asarray(leaves_b[0]))
    delete_checkpoint(str(tmp_path))
    assert load_checkpoint(str(tmp_path)) is None


def test_nan_guard():
    assert nan_guard(1.0) == 1.0
    with pytest.raises(NaNLossError):
        nan_guard(float("nan"), "in test")


def test_mlp_epoch_scan_matches_per_step_fit():
    """fit(epoch_step=...) must produce the same training trajectory as the
    per-step path: the epoch body replays the identical key stream."""
    from cliffordtpu.train.loop import make_mlp_epoch_step

    x = np.random.default_rng(1).uniform(0, 1, (96, 784)).astype(np.float32)

    def run(use_scan):
        model, state = _setup()
        return fit(
            state, make_mlp_train_step(model), make_mlp_eval_step(model),
            KEY, x[:64], x[64:], epochs=2, batch_size=16,
            beta_fn=lambda e: 0.5,
            epoch_step=make_mlp_epoch_step(model) if use_scan else None,
        )

    state_a, hist_a = run(False)
    state_b, hist_b = run(True)
    np.testing.assert_allclose(hist_a["train_loss"], hist_b["train_loss"],
                               rtol=1e-5)
    np.testing.assert_allclose(hist_a["val_loss"], hist_b["val_loss"],
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_cnn_epoch_scan_matches_per_step():
    """make_cnn_epoch_step == looped make_cnn_train_step on the same keys."""
    from cliffordtpu.nn import CNNVAE
    from cliffordtpu.train.loop import (
        make_cnn_epoch_step,
        make_cnn_train_step,
        stack_epoch_batches,
    )

    model = CNNVAE(latent_dim=8, in_channels=1, distribution="clifford",
                   img_size=32)
    x = np.random.default_rng(2).uniform(
        -1, 1, (24, 32, 32, 1)).astype(np.float32)
    beta = jnp.float32(0.7)
    ekey = jax.random.fold_in(KEY, 1)
    perm = np.arange(24)
    steps, bs = 3, 8

    state_a = create_train_state(KEY, model, jnp.asarray(x[:2]),
                                 optimizer="adamw", lr=1e-3, clip_norm=1.0)
    step = make_cnn_train_step(model)
    per_step_losses = []
    for s in range(steps):
        xb = jnp.asarray(x[perm[s * bs:(s + 1) * bs]])
        state_a, losses = step(state_a, xb,
                               jax.random.fold_in(ekey, s + 1), beta)
        per_step_losses.append(float(losses["total_loss"]))

    state_b = create_train_state(KEY, model, jnp.asarray(x[:2]),
                                 optimizer="adamw", lr=1e-3, clip_norm=1.0)
    epoch_step = make_cnn_epoch_step(model)
    batches = stack_epoch_batches(x, perm, steps, bs)
    state_b, ep_losses = epoch_step(state_b, batches, ekey, beta)

    np.testing.assert_allclose(per_step_losses,
                               np.asarray(ep_losses["total_loss"]),
                               rtol=1e-5)
    # scan vs loop fuse differently in XLA -> last-ulp float noise
    for a, b in zip(jax.tree_util.tree_leaves(state_a.params),
                    jax.tree_util.tree_leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("opt,sigma_scale", [
    ("adam", None), ("adamw", None), ("adamw", 0.1)])
def test_fused_optimizer_matches_optax(opt, sigma_scale):
    """{adam,adamw}_fused (one flat-vector update, the TPU fast path) must
    produce the same parameter trajectory as the per-leaf optax chain
    clip_by_global_norm(1.0) + optax.{adam,adamw}."""
    from cliffordtpu.nn import CNNVAE
    from cliffordtpu.train.loop import make_cnn_train_step

    model = CNNVAE(latent_dim=8, in_channels=1, distribution="clifford",
                   use_learnable_beta=sigma_scale is not None)
    x = jax.random.uniform(KEY, (4, 32, 32, 1)) * 2 - 1
    states = {}
    for name in (opt, opt + "_fused"):
        st = create_train_state(KEY, model, x[:2], optimizer=name,
                                lr=1e-3, sigma_lr_scale=sigma_scale)
        step = make_cnn_train_step(model)
        for i in range(5):
            st, losses = step(st, x, jax.random.fold_in(KEY, i),
                              jnp.float32(1.0))
        states[name] = st
    ref = jax.tree_util.tree_leaves(states[opt].params)
    fused = jax.tree_util.tree_leaves(states[opt + "_fused"].params)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    assert np.isfinite(float(losses["total_loss"]))
