"""Train-loop mechanics: early stopping, best-params restore, checkpoint
round-trip, NaN guard."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
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


def test_legacy_vit_checkpoint_rope_migration(tmp_path):
    """Pre-v2 checkpoints hold ViT q/k kernels in the interleaved RoPE
    layout; loading must (a) refuse without n_heads, (b) permute them (and
    the adam moments) to the half-split layout so attention is unchanged.
    Constructed by inverse-permuting a current checkpoint's q/k columns
    (exactly what a v1 training run would have stored) and deleting the
    layout tag."""
    import os
    import orbax.checkpoint as ocp

    from cliffordtpu.nn import CliffordARVAE
    from cliffordtpu.train.checkpoint import (
        _CKPT_NAME,
        _rope_half_perm,
        model_n_heads,
    )

    model = CliffordARVAE(
        latent_dim=4, image_size=32, in_channels=1, distribution="clifford",
        cnn_chs=[16, 64, 128], z_channels=128, encoder_vit_layers=1,
        decoder_vit_layers=1, patch_size=4,
    )
    n_heads = model_n_heads(model)
    assert n_heads == 2
    x = jnp.zeros((2, 32, 32, 1))
    state = create_train_state(KEY, model, x, optimizer="adamw", lr=1e-4)
    save_checkpoint(str(tmp_path), state, step=3, best_metric=0.5)
    current = load_checkpoint(str(tmp_path))
    assert current["rope_layout"] == "half"

    # forge the v1 payload: inverse-permute every Attention q/k kernel,
    # drop the format tags
    def invert(tree):
        if isinstance(tree, (list, tuple)):
            for v in tree:
                invert(v)
            return
        if not isinstance(tree, dict):
            return
        for k, v in tree.items():
            if str(k).startswith("Attention_") and isinstance(v, dict):
                for dense in ("Dense_0", "Dense_1"):
                    kern = v[dense]["kernel"]
                    perm = _rope_half_perm(kern.shape[1], n_heads)
                    inv = np.empty_like(perm)
                    inv[perm] = np.arange(len(perm))
                    v[dense]["kernel"] = np.asarray(kern)[:, inv]
            invert(v)

    import copy
    legacy = {k: copy.deepcopy(v) for k, v in current.items()
              if k not in ("rope_layout", "format_version")}
    invert(legacy["params"])
    invert(legacy["opt_state"])
    import shutil
    shutil.rmtree(os.path.join(str(tmp_path), _CKPT_NAME))
    ocp.PyTreeCheckpointer().save(
        os.path.join(str(tmp_path), _CKPT_NAME), legacy)

    with pytest.raises(ValueError, match="pre-v2"):
        load_checkpoint(str(tmp_path))

    migrated = load_checkpoint(str(tmp_path), n_heads=n_heads)
    assert migrated["rope_layout"] == "half"
    ref_leaves = jax.tree_util.tree_leaves_with_path(current["params"])
    mig = migrated["params"]
    for path, leaf in ref_leaves:
        got = mig
        for p in path:
            got = got[getattr(p, "key", None) or str(p)]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(got))


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


def test_fit_trials_matches_sequential_fit():
    """Batched-trial training (fit_trials: vmap over the trial axis) must
    reproduce each trial of the sequential fit() path — same per-lane key
    stream, best-checkpoint selection, and per-trial early stopping."""
    from cliffordtpu.train.loop import (fit_trials, index_trial_state,
                                        stack_trial_states)

    x = np.random.default_rng(2).uniform(0, 1, (96, 784)).astype(np.float32)
    x_tr, x_val = x[:64], x[64:]
    model = MLPVAE(h_dim=128, z_dim=4, distribution="clifford")
    T = 3
    trial_keys = [jax.random.fold_in(KEY, 100 + t) for t in range(T)]
    # low patience so lanes stop at different epochs
    kw = dict(epochs=6, batch_size=16, beta_fn=lambda e: 0.5, patience=2)

    seq = []
    for t in range(T):
        state = create_train_state(trial_keys[t], model,
                                   jnp.zeros((2, 784)), lr=1e-3)
        seq.append(fit(
            state, make_mlp_train_step(model), make_mlp_eval_step(model),
            jax.random.fold_in(trial_keys[t], 1), x_tr, x_val, **kw))

    states = stack_trial_states([
        create_train_state(trial_keys[t], model, jnp.zeros((2, 784)),
                           lr=1e-3) for t in range(T)])
    fit_keys = jnp.stack([jax.random.fold_in(k, 1) for k in trial_keys])
    states_v, hists_v = fit_trials(states, fit_keys, x_tr, x_val, model,
                                   **kw)

    for t in range(T):
        state_s, hist_s = seq[t]
        assert len(hists_v[t]["train_loss"]) == len(hist_s["train_loss"])
        np.testing.assert_allclose(hists_v[t]["train_loss"],
                                   hist_s["train_loss"], rtol=2e-4)
        np.testing.assert_allclose(hists_v[t]["val_loss"],
                                   hist_s["val_loss"], rtol=2e-4)
        np.testing.assert_allclose(hists_v[t]["best_val"],
                                   hist_s["best_val"], rtol=2e-4)
        state_t = index_trial_state(states_v, t)
        for a, b in zip(jax.tree_util.tree_leaves(state_t.params),
                        jax.tree_util.tree_leaves(state_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-3)


def test_fit_trials_short_batch_matches_sequential():
    """n_train < batch_size: fit() trains ONE short batch per epoch; the
    static-shape vmapped path must cap the train batch (not crash) while
    keeping the val key stream at the caller's batch_size."""
    from cliffordtpu.train.loop import (fit_trials, index_trial_state,
                                        stack_trial_states)

    x = np.random.default_rng(3).uniform(0, 1, (50, 784)).astype(np.float32)
    x_tr, x_val = x[:18], x[18:]   # 18 < batch_size 32
    model = MLPVAE(h_dim=128, z_dim=4, distribution="normal")
    kw = dict(epochs=2, batch_size=32, beta_fn=lambda e: 1.0, patience=5)
    k0 = jax.random.fold_in(KEY, 7)
    state = create_train_state(k0, model, jnp.zeros((2, 784)), lr=1e-3)
    _, hist_s = fit(
        state, make_mlp_train_step(model), make_mlp_eval_step(model),
        jax.random.fold_in(k0, 1), x_tr, x_val, **kw)

    states = stack_trial_states([
        create_train_state(k0, model, jnp.zeros((2, 784)), lr=1e-3)])
    _, hists_v = fit_trials(
        states, jnp.stack([jax.random.fold_in(k0, 1)]), x_tr, x_val,
        model, **kw)
    np.testing.assert_allclose(hists_v[0]["train_loss"],
                               hist_s["train_loss"], rtol=2e-4)
    np.testing.assert_allclose(hists_v[0]["val_loss"], hist_s["val_loss"],
                               rtol=2e-4)


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
    implement the same transform as clip_by_global_norm(1.0) +
    optax.{adam,adamw}.

    Compared on IDENTICAL synthetic gradient trees — running two
    separately-jitted model programs instead would give ulp-different
    gradients, and Adam's first step is sign(g), so elements with g ~ 0
    flip sign between runs (observed: 559/2M elements off by 2*lr)."""
    from cliffordtpu.train.state import make_optimizer

    key = jax.random.PRNGKey(3)
    params = {
        "Dense_0": {"kernel": jax.random.normal(key, (32, 16)) * 0.1,
                    "bias": jnp.zeros((16,))},
        "log_sigma_0": jnp.zeros((1,)),
    }
    ref_tx = make_optimizer(opt, lr=1e-3, clip_norm=1.0,
                            sigma_lr_scale=sigma_scale, params=params)
    fused_tx = make_optimizer(opt + "_fused", lr=1e-3, clip_norm=1.0,
                              sigma_lr_scale=sigma_scale, params=params)
    p_ref = p_fused = params
    s_ref = ref_tx.init(params)
    s_fused = fused_tx.init(params)
    for i in range(7):
        gk = jax.random.fold_in(key, i)
        # mixed-magnitude grads, incl. a step that triggers the clip branch
        scale = 40.0 if i == 3 else 0.5
        grads = jax.tree_util.tree_map(
            lambda p, k=gk: scale * jax.random.normal(
                jax.random.fold_in(k, p.size), p.shape), p_ref)
        u_ref, s_ref = ref_tx.update(grads, s_ref, p_ref)
        p_ref = optax.apply_updates(p_ref, u_ref)
        u_fused, s_fused = fused_tx.update(grads, s_fused, p_fused)
        p_fused = optax.apply_updates(p_fused, u_fused)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_fused_optimizer_trains_model():
    """adamw_fused end-to-end smoke: loss falls, stays finite."""
    from cliffordtpu.nn import CNNVAE
    from cliffordtpu.train.loop import make_cnn_train_step

    model = CNNVAE(latent_dim=8, in_channels=1, distribution="clifford")
    x = jax.random.uniform(KEY, (4, 32, 32, 1)) * 2 - 1
    st = create_train_state(KEY, model, x[:2], optimizer="adamw_fused",
                            lr=1e-3)
    step = make_cnn_train_step(model)
    first = last = None
    for i in range(6):
        st, losses = step(st, x, jax.random.fold_in(KEY, i),
                          jnp.float32(1.0))
        v = float(losses["total_loss"])
        first = v if first is None else first
        last = v
    assert np.isfinite(last) and last < first, (first, last)


def test_grad_accum_matches_mean_grad_update():
    """accum_steps=N (optax.MultiSteps): params hold still for N-1
    microbatch steps, then one update equal to applying the MEAN of the N
    microbatch gradients through the same Adam+clip chain (big-batch
    semantics)."""
    import optax

    from cliffordtpu.nn.losses import vae_loss_from_outputs
    from cliffordtpu.nn.mlp_vae import MLPVAE
    from cliffordtpu.train.loop import make_mlp_train_step

    model = MLPVAE(h_dim=16, z_dim=4, distribution="normal")
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (16, 784))
    micro = [x[i * 4:(i + 1) * 4] for i in range(4)]
    keys = [jax.random.fold_in(key, i) for i in range(4)]

    state_a = create_train_state(key, model, x[:2], optimizer="adam",
                                 lr=1e-3, accum_steps=4)
    state_b = create_train_state(key, model, x[:2], optimizer="adam",
                                 lr=1e-3)
    p0 = jax.tree_util.tree_map(np.asarray, state_a.params)

    step = make_mlp_train_step(model, binarize=False)
    for i in range(4):
        state_a, _ = step(state_a, micro[i], keys[i], 1.0)
        if i < 3:  # updates held until the cycle completes
            jax.tree_util.tree_map(
                np.testing.assert_array_equal,
                jax.tree_util.tree_map(np.asarray, state_a.params), p0)

    # manual mean-gradient through the same (clip + adam) chain; the
    # train step splits the key and binarize=False discards k_bin
    def grad_for(params, xb, k):
        _, k_sample = jax.random.split(k)

        def loss_fn(p):
            outputs = model.apply({"params": p}, xb,
                                  rngs={"sample": k_sample})
            return vae_loss_from_outputs(xb, outputs, 1.0)["total"]

        return jax.grad(loss_fn)(params)

    grads = [grad_for(state_b.params, micro[i], keys[i]) for i in range(4)]
    g_mean = jax.tree_util.tree_map(
        lambda *g: sum(g) / 4.0, *grads)
    state_b = state_b.apply_gradients(grads=g_mean)

    # MultiSteps accumulates a running mean (incremental) vs the sum/4
    # here — reassociated fp32, hence the 1e-5 tolerance
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5),
        state_a.params, state_b.params)
