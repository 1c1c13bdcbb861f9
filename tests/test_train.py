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
