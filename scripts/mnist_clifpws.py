#!/usr/bin/env python
"""MNIST experiment runner: clifford / powerspherical / gaussian sweep.

JAX rebuild of ``mnist/mnist_clifpws.py:176-749`` with flag and artifact
parity: same flags and defaults, same output files
(``visualizations/d_{d}/{dist}/*.png``,
``results/mnist-{dist}-d{d}-l1-trial{n}/{vsa_raw,metrics}.json``,
``mnist_vae_results.csv``, ``mnist_clifpws_timing.json``) relative to
``--outdir``.

Run ``--epochs 2 --n_runs 1 --d_dims 5`` for a smoke test.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon sitecustomize pins the platform to the TPU tunnel regardless of
# JAX_PLATFORMS; re-assert the user's choice so CPU smoke runs stay on CPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np

from cliffordtpu.data import load_dataset
from cliffordtpu.eval import ModelHandle
from cliffordtpu.eval.binding import (
    test_cross_class_bind_unbind,
    test_pairwise_bind_bundle_decode,
    test_self_binding,
)
from cliffordtpu.eval.class_means import (
    compute_class_means,
    evaluate_mean_vector_cosine,
)
from cliffordtpu.eval.knn import perform_knn_evaluation
from cliffordtpu.eval.plots import (
    plot_clifford_manifold_visualization,
    plot_gaussian_manifold_visualization,
    plot_interpolations,
    plot_latent_space,
    plot_powerspherical_manifold_visualization,
    plot_reconstructions,
)
from cliffordtpu.nn import MLPVAE
from cliffordtpu.nn.losses import compute_test_metrics
from cliffordtpu.runners.safety import EMPTY_BINDING, EMPTY_CURVE, safe_eval
from cliffordtpu.train.loop import (
    fit,
    fit_trials,
    index_trial_state,
    make_mlp_epoch_step,
    make_mlp_eval_step,
    make_mlp_train_step,
    stack_trial_states,
)
from cliffordtpu.train.schedules import linear_kl_warmup
from cliffordtpu.train.state import create_train_state
from cliffordtpu.utils import WandbLogger, ensure_dir, stable_hash
from cliffordtpu.utils.artifacts import load_json, merge_json_write
from cliffordtpu.vsa.capacity import (
    test_binding_unbinding_pairs as vsa_binding_unbinding,
    test_bundle_capacity as vsa_bundle_capacity,
    test_per_class_bundle_capacity_k_items,
)

KNN_SAMPLES = [100, 600, 1000]
DISTRIBUTIONS = ["normal", "normal_nol2", "powerspherical", "clifford"]


def _jsonable(o):
    if isinstance(o, dict):
        return {k: _jsonable(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_jsonable(v) for v in o]
    if hasattr(o, "tolist"):
        return o.tolist()
    return o






def _run_subprocess_eval(args, state, outdir, *, arch, distribution,
                         latent_dim, l2_normalize, rf_no_random_keys=True,
                         table_only=False):
    """Save checkpoint + run scripts/eval_checkpoint.py in a fresh CPU-only
    process (axon-wedge isolation; same pattern as the CNN runner)."""
    import subprocess

    from cliffordtpu.train.checkpoint import (
        delete_checkpoint,
        save_checkpoint,
    )

    try:
        save_checkpoint(outdir, state, step=0)
        script = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "eval_checkpoint.py")
        if not os.path.exists(script):
            script = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "scripts", "eval_checkpoint.py")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        cmd = [sys.executable, script, "--ckpt", outdir, "--arch", arch,
               "--distribution", distribution,
               "--latent_dim", str(latent_dim),
               "--dataset", "mnist", "--img_size", "28",
               "--outdir", outdir,
               "--vsa_trials", str(args.vsa_trials),
               # MNIST item-memory protocol: posterior means, n=500
               # (mnist_clifpws.py:364-376 analogue) — keeps subprocess
               # VSA metrics comparable with the in-process battery
               "--item_memory", "means"]
        if l2_normalize:
            cmd += ["--l2_normalize"]
        if rf_no_random_keys:
            cmd += ["--rf_no_random_keys"]
        if table_only:
            # sweep mode beyond --full_eval_runs: only the table feed
            # (kNN + mean-vector cosine) — without this the subprocess
            # ran the FULL battery every run and --full_eval_runs was
            # silently dead in --eval_subprocess mode
            cmd += ["--table_only"]
        if args.limit_train:
            cmd += ["--limit_train", str(args.limit_train)]
        if args.limit_test:
            cmd += ["--limit_test", str(args.limit_test)]
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           timeout=7200)
        if r.returncode != 0:
            print(f"warning: subprocess eval failed rc={r.returncode}:\n"
                  f"{r.stderr[-2000:]}")
            return False, {}, {}
        with open(os.path.join(outdir, "metrics.json")) as fh:
            metrics = json.load(fh)
        with open(os.path.join(outdir, "vsa_raw.json")) as fh:
            vsa = json.load(fh)
        delete_checkpoint(outdir)
        return True, metrics, vsa
    except Exception as e:
        print(f"warning: subprocess eval errored: {e!r}")
        return False, {}, {}


def _eval_context():
    """Eval battery placement: on the axon TPU individual ops sporadically
    throw UNIMPLEMENTED, and the reference pins its FFT eval work to CPU
    anyway (``utils/vsa.py:266-267``) — so when training ran on TPU, run
    the whole eval battery on the coexisting CPU backend.  Returns
    (context_manager, device_or_None)."""
    import contextlib

    if jax.default_backend() == "tpu":
        try:
            cpu = jax.devices("cpu")[0]
            return jax.default_device(cpu), cpu
        except RuntimeError:
            pass
    return contextlib.nullcontext(), None


def _batches(x, y, bs):
    for s in range(0, len(x), bs):
        yield x[s:s + bs], y[s:s + bs]


def run(args):
    from cliffordtpu.utils.compile_cache import enable_persistent_cache

    # --distributions subsets the reference's fixed family list (an
    # extension; the reference always runs all four)
    dists = getattr(args, "distributions", None) or DISTRIBUTIONS
    for d in dists:
        if d not in DISTRIBUTIONS:
            raise SystemExit(f"unknown distribution {d!r}; "
                             f"choose from {DISTRIBUTIONS}")

    script_start_time = time.time()
    timing_results = {}
    enable_persistent_cache()
    os.chdir(ensure_dir(args.outdir))
    print(f"Using device: {jax.devices()[0]}")

    ds = load_dataset("mnist", n_train=args.limit_train,
                      n_test=args.limit_test)
    if ds["source"] == "synthetic":
        if getattr(args, "require_real", False):
            raise SystemExit(
                "--require_real: no real MNIST found (searched "
                "$CLIFFORDTPU_DATA_DIR, ./data, /root/data — note the "
                "runner chdirs into --outdir, so pass an ABSOLUTE path)")
        print("WARNING: no real MNIST found — using the synthetic fallback "
              "(cliffordtpu/data/loaders.py)")
    timing_results["data_source"] = ds["source"]
    x_all = ds["x_train"].reshape(len(ds["x_train"]), -1)
    y_all = ds["y_train"]
    # 90/10 train/val split (reference :194-196)
    n_train = int(0.9 * len(x_all))
    x_train, y_train = x_all[:n_train], y_all[:n_train]
    x_val = x_all[n_train:]
    x_test = ds["x_test"].reshape(len(ds["x_test"]), -1)
    y_test = ds["y_test"]

    root_key = jax.random.PRNGKey(args.seed)
    logger = WandbLogger(args)

    for mdim in args.d_dims:
        print(f"\n{'=' * 30}\n==d = {mdim} ==\n{'=' * 30}")
        agg_results = {d: {s: [] for s in KNN_SAMPLES} for d in dists}
        agg_f1 = {d: {s: [] for s in KNN_SAMPLES} for d in dists}
        agg_metrics = {d: {"ll": [], "entropy": [], "recon": [], "kl": []}
                       for d in dists}
        agg_mvc = {d: [] for d in dists}

        for dist in dists:
            model_z_dim = mdim + 1 if dist == "powerspherical" else mdim
            if dist == "clifford" and mdim < 2:
                continue
            print(f"\n--- Testing {dist.upper()}-VAE with d={mdim} "
                  f"(model z_dim={model_z_dim}, lr={args.lr}) ---")

            # batched-trial training: all n_runs lanes advance together in
            # one vmapped XLA program (per-lane results == sequential fit;
            # tests/test_train.py::test_fit_trials_matches_sequential_fit)
            vmapped = None
            if getattr(args, "vmap_trials", False) and args.n_runs > 1:
                run_keys = [
                    jax.random.fold_in(
                        jax.random.fold_in(root_key, mdim * 1000 + r),
                        stable_hash(dist) % 100_000)
                    for r in range(args.n_runs)
                ]
                l2n = dist == "normal"
                mdist = "normal" if dist == "normal_nol2" else dist
                vmodel = MLPVAE(h_dim=args.h_dim, z_dim=model_z_dim,
                                distribution=mdist, l2_normalize=l2n)
                vstates = stack_trial_states([
                    create_train_state(k, vmodel, jnp.zeros((2, 784)),
                                       optimizer="adam", lr=args.lr,
                                       clip_norm=1.0) for k in run_keys])
                fit_keys = jnp.stack(
                    [jax.random.fold_in(k, 1) for k in run_keys])
                t0 = time.time()
                vstates, vhists = fit_trials(
                    vstates, fit_keys, x_train, x_val, vmodel,
                    epochs=args.epochs, batch_size=args.batch_size,
                    beta_fn=lambda e: linear_kl_warmup(
                        e, args.warmup_epochs),
                    patience=(args.patience if args.patience > 0
                              else 10**9),
                    log_fn=(lambda e, m: logger.log_metrics(
                        {"epoch": e, **m})) if logger.use else None,
                )
                vtime = time.time() - t0
                print(f"vmapped training: {args.n_runs} trials in "
                      f"{vtime:.2f}s "
                      f"({vtime / args.n_runs:.2f}s/trial amortized)")
                vmapped = (vstates, vhists, vtime)

            for run_i in range(args.n_runs):
                print(f"\n--- Run {run_i + 1}/{args.n_runs} ---")
                run_start_time = time.time()
                run_key = jax.random.fold_in(
                    jax.random.fold_in(root_key, mdim * 1000 + run_i),
                    stable_hash(dist) % 100_000)
                if logger.use:
                    logger.start_run(f"{dist}-d{mdim}-run{run_i + 1}", args)

                l2_norm = dist == "normal"
                model_dist = "normal" if dist == "normal_nol2" else dist
                model = MLPVAE(h_dim=args.h_dim, z_dim=model_z_dim,
                               distribution=model_dist, l2_normalize=l2_norm)

                train_start_time = time.time()
                if vmapped is not None:
                    state = index_trial_state(vmapped[0], run_i)
                    history = vmapped[1][run_i]
                    train_time = vmapped[2] / args.n_runs  # amortized
                else:
                    state = create_train_state(
                        run_key, model, jnp.zeros((2, 784)),
                        optimizer="adam", lr=args.lr, clip_norm=1.0)

                    train_step = make_mlp_train_step(model)
                    eval_step = make_mlp_eval_step(model)
                    epoch_step = (make_mlp_epoch_step(model)
                                  if args.scan_epochs else None)
                    state, history = fit(
                        state, train_step, eval_step,
                        jax.random.fold_in(run_key, 1),
                        x_train, x_val,
                        epochs=args.epochs, batch_size=args.batch_size,
                        beta_fn=lambda e: linear_kl_warmup(
                            e, args.warmup_epochs),
                        patience=(args.patience if args.patience > 0
                                  else 10**9),
                        log_fn=(lambda e, m: logger.log_metrics(
                            {"epoch": e, **m})) if logger.use else None,
                        epoch_step=epoch_step,
                    )
                    train_time = time.time() - train_start_time
                best_val_loss = history["best_val"]
                print(f"training time for {dist}-d{mdim}-run{run_i + 1}: "
                      f"{train_time:.2f}s "
                      f"({len(history['train_loss'])} epochs)")

                eval_start_time = time.time()
                vis_dir_pre = ensure_dir(f"visualizations/d_{mdim}/{dist}")
                # sweep mode (--full_eval_runs N): the heavy VSA battery
                # + plot stages run on the first N runs per (dim, dist)
                # only — in-process via hstage(), in subprocess mode via
                # eval_checkpoint --table_only
                heavy_ok = run_i < getattr(args, "full_eval_runs", 10**9)
                did_sub, sub_metrics, sub_vsa = False, {}, {}
                train_only = getattr(args, "train_only", False)
                if train_only:
                    did_sub = True  # route every stage() to its default
                elif getattr(args, "eval_subprocess", False):
                    did_sub, sub_metrics, sub_vsa = _run_subprocess_eval(
                        args, state, vis_dir_pre, arch="mlp",
                        distribution=model_dist, latent_dim=model_z_dim,
                        l2_normalize=l2_norm, table_only=not heavy_ok)

                def stage(label, fn, default=None):
                    if did_sub:
                        return default
                    return safe_eval(label, fn, default)

                def hstage(label, fn, default=None):
                    if not heavy_ok:
                        return default
                    return stage(label, fn, default)

                eval_ctx, eval_dev = _eval_context()
                eval_ctx.__enter__()
                eval_params = (jax.device_put(state.params, eval_dev)
                               if eval_dev is not None else state.params)
                handle = ModelHandle(model, eval_params)
                # key must live on the eval device too, or committed-input
                # placement drags eval computations back onto the TPU
                eval_root = (jax.device_put(run_key, eval_dev)
                             if eval_dev is not None else run_key)
                ekey = jax.random.fold_in(eval_root, 2)

                _nan_metrics = {"ll": float("nan"), "entropy": float("nan"),
                                "recon": float("nan"), "kl": float("nan")}
                test_metrics = _nan_metrics if train_only else safe_eval(
                    "compute_test_metrics",
                    lambda: compute_test_metrics(
                        ekey, model, eval_params,
                        _batches(x_test, y_test, 512)),
                    default=_nan_metrics)
                for mname in ["ll", "entropy", "recon", "kl"]:
                    agg_metrics[dist][mname].append(test_metrics[mname])
                print(f"  LL: {test_metrics['ll']:.2f}, "
                      f"L[q]: {test_metrics['entropy']:.2f}, "
                      f"RE: {test_metrics['recon']:.2f}, "
                      f"KL: {test_metrics['kl']:.2f}")

                knn_results = stage(
                    "knn_evaluation",
                    lambda: perform_knn_evaluation(
                        handle, x_train, y_train, x_test, y_test,
                        [s for s in KNN_SAMPLES if s <= len(x_train)],
                        key=ekey),
                    default={})
                if not did_sub:
                    for s in KNN_SAMPLES:
                        if f"knn_acc_{s}" in knn_results:
                            agg_results[dist][s].append(
                                knn_results[f"knn_acc_{s}"])
                            agg_f1[dist][s].append(
                                knn_results[f"knn_f1_{s}"])

                vis_dir = ensure_dir(f"visualizations/d_{mdim}/{dist}")
                deconv_dir = ensure_dir(f"{vis_dir}/deconv")
                x_sub, y_sub = x_test[:1000], y_test[:1000]

                fourier_pseudo = hstage(
                    "self_binding(*)",
                    lambda: test_self_binding(
                        handle, x_sub, y_sub, vis_dir, unbind_method="*",
                        key=ekey),
                    default=dict(EMPTY_BINDING))
                fourier_deconv = hstage(
                    "self_binding(†)",
                    lambda: test_self_binding(
                        handle, x_sub, y_sub, deconv_dir, unbind_method="†",
                        key=ekey),
                    default=dict(EMPTY_BINDING))

                # item memory of posterior means (reference :364-376)
                n_mem = min(500, len(x_test))
                item_memory = hstage(
                    "item_memory",
                    lambda: handle.latent_mu(x_test[:n_mem], ekey))
                item_labels = y_test[:n_mem]
                item_images = ds["x_test"][:n_mem]

                if heavy_ok and not did_sub:
                    print(f"running VSA battery ({dist})...")
                hstage("per_class_bundle", lambda: test_per_class_bundle_capacity_k_items(
                    d=item_memory.shape[-1], n_items=n_mem, n_classes=10,
                    items_per_class=1, n_trials=2, plot=True,
                    save_dir=vis_dir, item_memory=item_memory,
                    labels=jnp.asarray(item_labels),
                    item_images=item_images * 2 - 1,
                    class_names=[str(i) for i in range(10)], key=ekey))

                bundle_cap_raw = hstage(
                    "bundle_capacity",
                    lambda: vsa_bundle_capacity(
                        d=item_memory.shape[-1], n_items=n_mem,
                        k_range=list(range(5, 51, 5)),
                        n_trials=args.vsa_trials, plot=True,
                        save_dir=vis_dir, item_memory=item_memory, key=ekey),
                    default=dict(EMPTY_CURVE))

                rf_results = {}
                for ubmethod, rf_name in [
                    ("*", "role_filler_no_random_keys"),
                    ("†", "role_filler_no_random_keys_deconv"),
                ]:
                    save_d = deconv_dir if ubmethod == "†" else vis_dir
                    rf_res = hstage(
                        f"role_filler({ubmethod})",
                        lambda ub=ubmethod, sd=save_d: vsa_binding_unbinding(
                            d=item_memory.shape[-1], n_items=n_mem,
                            k_range=list(range(2, 21, 2)),
                            n_trials=args.vsa_trials, plot=True,
                            unbind_method=ub, save_dir=sd,
                            item_memory=item_memory, bind_with_random=False,
                            key=ekey),
                        default=dict(EMPTY_CURVE))
                    rf_results[rf_name] = rf_res
                    default_plot = os.path.join(save_d,
                                                "role_filler_capacity.png")
                    if os.path.exists(default_plot):
                        os.rename(default_plot,
                                  os.path.join(save_d, f"{rf_name}.png"))
                role_filler_raw = rf_results.get(
                    "role_filler_no_random_keys", {})

                hstage("pairwise_bind_bundle",
                          lambda: test_pairwise_bind_bundle_decode(
                              handle, x_sub, y_sub, vis_dir,
                              img_shape=(28, 28, 1),
                              class_names=[str(i) for i in range(10)],
                              key=ekey))
                hstage("cross_class_bind_unbind",
                          lambda: test_cross_class_bind_unbind(
                              handle, x_sub, y_sub, vis_dir,
                              img_shape=(28, 28, 1), class_a=6, class_b=9,
                              key=ekey))

                hstage("reconstructions", lambda: plot_reconstructions(
                    handle, x_test, os.path.join(vis_dir,
                                                 "reconstructions.png"),
                    key=ekey))
                hstage("interpolations", lambda: plot_interpolations(
                    handle, x_test, y_test,
                    os.path.join(vis_dir, "interpolations.png"), key=ekey))
                hstage("tsne", lambda: plot_latent_space(
                    handle, x_test, y_test, os.path.join(vis_dir, "tsne.png"),
                    n_plot=min(1000, len(x_test)), key=ekey))

                mean_vector_acc = stage(
                    "mean_vector_cosine",
                    lambda: evaluate_mean_vector_cosine(
                        handle, x_test, y_test,
                        compute_class_means(
                            handle, x_all[:5000], y_all[:5000],
                            max_per_class=1000, key=ekey),
                        key=ekey)[0],
                    default=0.0)
                if not did_sub:
                    print(f"  mean vector cosine acc: "
                          f"{mean_vector_acc:.4f}")
                    agg_mvc[dist].append(float(mean_vector_acc))

                if did_sub:
                    knn_results = {k: v for k, v in sub_metrics.items()
                                   if k.startswith("knn_")}
                    for s in KNN_SAMPLES:
                        if f"knn_acc_{s}" in knn_results:
                            agg_results[dist][s].append(
                                knn_results[f"knn_acc_{s}"])
                            agg_f1[dist][s].append(
                                knn_results[f"knn_f1_{s}"])
                    mean_vector_acc = sub_metrics.get(
                        "mean_vector_cosine_acc", 0.0)
                    agg_mvc[dist].append(float(mean_vector_acc))
                    bundle_cap_raw = sub_vsa.get(
                        "bundle_cap", dict(EMPTY_CURVE))
                    role_filler_raw = sub_vsa.get(
                        "role_filler", dict(EMPTY_CURVE))
                    fourier_pseudo = {**EMPTY_BINDING,
                                      **sub_vsa.get("self_binding_star", {})}
                    fourier_deconv = {
                        **EMPTY_BINDING,
                        **sub_vsa.get("self_binding_dagger", {})}
                    for fr in (fourier_pseudo, fourier_deconv):
                        if fr.get("k_sims"):
                            fr["binding_k_self_similarity"] = float(
                                fr["k_sims"][-1])

                # per-trial dumps (reference :493-527)
                dist_out = {"normal": "gaussian",
                            "normal_nol2": "gaussian_nol2"}.get(dist, dist)
                trial_dir = ensure_dir(
                    f"results/mnist-{dist_out}-d{mdim}-l1-trial{run_i + 1}")
                raw_vsa = {
                    "bundle_cap": bundle_cap_raw,
                    "role_filler": role_filler_raw,
                    "self_binding_star": {
                        "k_values": fourier_pseudo.get("k_values", []),
                        "k_sims": fourier_pseudo.get("k_sims", []),
                    },
                    "self_binding_dagger": {
                        "k_values": fourier_deconv.get("k_values", []),
                        "k_sims": fourier_deconv.get("k_sims", []),
                    },
                }
                with open(f"{trial_dir}/vsa_raw.json", "w") as f:
                    json.dump(_jsonable(raw_vsa), f)
                trial_metrics_out = {
                    **{k: v for k, v in knn_results.items()
                       if k.startswith("knn_")},
                    "mean_vector_cosine_acc": float(mean_vector_acc),
                    "test/ll": test_metrics["ll"],
                    "test/entropy": test_metrics["entropy"],
                    "test/recon": test_metrics["recon"],
                    "test/kl": test_metrics["kl"],
                    "final_val_loss": best_val_loss,
                }
                with open(f"{trial_dir}/metrics.json", "w") as f:
                    json.dump(trial_metrics_out, f, indent=2)

                if dist == "clifford" and mdim >= 2:
                    hstage("clifford_manifold",
                              lambda: plot_clifford_manifold_visualization(
                                  handle, vis_dir, n_grid=16, dims=(0, 1)))
                elif dist == "powerspherical" and mdim >= 2:
                    hstage("ps_manifold",
                              lambda: plot_powerspherical_manifold_visualization(
                                  handle, vis_dir, n_samples=1000,
                                  dims=(0, 1), key=ekey))
                elif dist == "normal" and mdim >= 2:
                    hstage("gaussian_manifold",
                              lambda: plot_gaussian_manifold_visualization(
                                  handle, vis_dir, n_samples=1000,
                                  dims=(0, 1), key=ekey))

                if logger.use:
                    logger.log_summary({
                        **{k: v for k, v in knn_results.items()
                           if k.startswith("knn_")},
                        "final_val_loss": best_val_loss,
                        "mean_vector_cosine_acc": float(mean_vector_acc),
                        "test/ll": test_metrics["ll"],
                        "test/entropy": test_metrics["entropy"],
                        "test/recon": test_metrics["recon"],
                        "test/kl": test_metrics["kl"],
                    })
                    logger.finish_run()

                eval_ctx.__exit__(None, None, None)
                eval_time = time.time() - eval_start_time
                run_time = time.time() - run_start_time
                timing_results[f"{dist}_d{mdim}_run{run_i + 1}"] = {
                    "train_time_s": train_time,
                    "eval_time_s": eval_time,
                    "total_run_time_s": run_time,
                }
                print(f"eval time: {eval_time:.2f}s, "
                      f"total run time: {run_time:.2f}s")

        # persist this dim's raw per-trial aggregates to the merge-on-write
        # sidecar so sliced per-dim/per-family invocations aggregate into
        # one unified CSV (reference emits one CSV per sweep, :685-692)
        sidecar_update = {}
        for dist in dists:
            entry = {"mvc": [float(v) for v in agg_mvc[dist]]}
            for s in KNN_SAMPLES:
                entry[f"acc_{s}"] = [float(v) for v in agg_results[dist][s]]
                entry[f"f1_{s}"] = [float(v) for v in agg_f1[dist][s]]
            for metric in ["ll", "entropy", "recon", "kl"]:
                entry[metric] = [float(v) for v in agg_metrics[dist][metric]]
            sidecar_update[f"{mdim}|{dist}"] = entry
        merged_trials = merge_json_write("mnist_vae_trial_metrics.json",
                                         sidecar_update)
        # refresh the unified CSV + across-dims table after EVERY dim so
        # a deadline timeout-kill (the sweep chains run under `timeout`
        # by design) still leaves a table covering all completed dims
        _regenerate_summary_tables(quiet=True)

    _regenerate_summary_tables()

    # merge-on-write timing (sliced runs accumulate, totals add up)
    timing_results["total_script_time_s"] = time.time() - script_start_time
    prior_total = load_json("mnist_clifpws_timing.json").get(
        "total_script_time_s", 0.0)
    if isinstance(prior_total, (int, float)):
        timing_results["total_script_time_s"] += prior_total
    merge_json_write("mnist_clifpws_timing.json", timing_results)
    print(f"\ntotal script execution time: "
          f"{timing_results['total_script_time_s']:.2f}s")


def _regenerate_summary_tables(quiet=False):
    # unified mean±std CSV regenerated from the merged sidecar
    # (reference :659-692); column order follows the canonical family list
    merged_trials = load_json("mnist_vae_trial_metrics.json")
    all_dims = sorted({int(k.split("|")[0]) for k in merged_trials})
    dist_cols = [d for d in DISTRIBUTIONS
                 if any(k.split("|", 1)[1] == d for k in merged_trials)]
    rows = []
    for mdim in all_dims:
        row = {"d": mdim}
        for dist in dist_cols:
            D = dist.upper()
            e = merged_trials.get(f"{mdim}|{dist}", {})

            def _fmt(vals, pct=True):
                if not vals:
                    return "N/A"
                scale = 100 if pct else 1
                prec = 1 if pct else 2
                if len(vals) > 1:
                    return (f"{np.mean(vals) * scale:.{prec}f}±"
                            f"{np.std(vals) * scale:.{prec}f}")
                return f"{vals[0] * scale:.{prec}f}"

            for s in KNN_SAMPLES:
                row[f"{D}_acc_{s}"] = _fmt(e.get(f"acc_{s}", []))
                row[f"{D}_f1_{s}"] = _fmt(e.get(f"f1_{s}", []))
            row[f"{D}_mvc"] = _fmt(e.get("mvc", []))
            for metric in ["ll", "entropy", "recon", "kl"]:
                row[f"{D}_{metric}"] = _fmt(e.get(metric, []), pct=False)
        rows.append(row)
    if rows:
        import pandas as pd

        df = pd.DataFrame(rows).set_index("d")
        if not quiet:
            print("\n" + "=" * 25 + " all metrics " + "=" * 25)
            print(df.to_string())
        df.to_csv("mnist_vae_results.csv")

        # across-dims LaTeX/CSV with bold-best (the paper's headline table,
        # ``utils/wandb_utils.py:931-1134``) from the same merged sidecar
        try:
            across = {}
            for key, e in merged_trials.items():
                mdim_s, dist = key.split("|", 1)
                a = across.setdefault(dist, {
                    "knn_100": [], "knn_600": [], "knn_1000": [],
                    "f1_100": [], "f1_600": [], "f1_1000": [],
                    "mean_cosine": [], "dims": []})
                n = max([len(e.get(f"acc_{s}", [])) for s in KNN_SAMPLES]
                        + [len(e.get("mvc", []))] + [0])
                for i in range(n):
                    for s in KNN_SAMPLES:
                        acc = e.get(f"acc_{s}", [])
                        f1 = e.get(f"f1_{s}", [])
                        a[f"knn_{s}"].append(
                            acc[i] if i < len(acc) else float("nan"))
                        a[f"f1_{s}"].append(
                            f1[i] if i < len(f1) else float("nan"))
                    mvc = e.get("mvc", [])
                    a["mean_cosine"].append(
                        mvc[i] if i < len(mvc) else float("nan"))
                    a["dims"].append(int(mdim_s))
            for dist in across:  # stable dim order for the raw sidecar
                order = np.argsort(np.array(across[dist]["dims"]),
                                   kind="stable")
                for k in across[dist]:
                    across[dist][k] = [across[dist][k][i] for i in order]
            from cliffordtpu.eval.tables import plot_across_dims_comparison
            path = plot_across_dims_comparison(
                across, all_dims, "mnist", "results/comparisons/mnist")
            if path and not quiet:
                print(f"saved across-dims comparison to {path}")
        except Exception as e:
            print(f"warning: across-dims comparison failed: {e}")
    elif not quiet:
        print("no results were generated.")


def build_parser():
    parser = argparse.ArgumentParser(
        description="Run VAE experiments on MNIST, contrasting "
                    "clifford/gaussian/powerspherical")
    parser.add_argument("--d_dims", type=int, nargs="+",
                        default=[2, 5, 10, 20, 40, 128, 256])
    parser.add_argument("--h_dim", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=500)
    parser.add_argument("--patience", type=int, default=50)
    parser.add_argument("--warmup_epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--n_runs", type=int, default=20)
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str,
                        default="mnist-svae-experiments")
    # extensions over the reference CLI (defaults preserve its behavior)
    parser.add_argument("--outdir", type=str, default=".")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--require_real", action="store_true",
                        help="abort instead of training on the synthetic "
                             "fallback when no real dataset files are found")
    parser.add_argument("--limit_train", type=int, default=None,
                        help="cap train set size (smoke tests)")
    parser.add_argument("--limit_test", type=int, default=None)
    parser.add_argument("--vsa_trials", type=int, default=20)
    parser.add_argument("--eval_subprocess", action="store_true",
                        help="run the VSA/kNN battery in a fresh CPU-only "
                             "process (recommended on the axon TPU)")
    parser.add_argument("--scan_epochs", action="store_true",
                        help="compile each training epoch as ONE lax.scan "
                             "program (device-bound throughput on slow "
                             "hosts; same losses as the per-step path)")
    parser.add_argument("--vmap_trials", action="store_true",
                        help="train all n_runs trials of each "
                             "(distribution, d) cell SIMULTANEOUSLY as one "
                             "vmapped XLA program (per-trial results equal "
                             "the sequential path; the reference trains "
                             "its 20 runs one by one)")
    parser.add_argument("--full_eval_runs", type=int, default=10**9,
                        help="run the heavy VSA battery / plot stages on "
                             "only the first N runs per (dim, dist); all "
                             "runs keep the table-feeding eval (test "
                             "metrics, knn, mean-vector cosine).  Default: "
                             "all runs full")
    parser.add_argument("--train_only", action="store_true",
                        help="skip the eval battery entirely (timing/perf "
                             "studies); metrics columns come out NaN")
    parser.add_argument("--distributions", type=str, nargs="+", default=None,
                        help="subset of the latent families to run "
                             f"(default: all of {DISTRIBUTIONS}; an "
                             "extension — the reference always runs all)")
    return parser


if __name__ == "__main__":
    from cliffordtpu.utils.tpu_lock import hold_tpu_lock

    # one TPU client process at a time (ROADMAP round-4 s5/s6)
    _tpu_lock = hold_tpu_lock(label="mnist_clifpws")
    run(build_parser().parse_args())
