#!/usr/bin/env python
"""vMF-VAE MNIST runner — JAX rebuild of ``mnist/mnist_vmf.py:136-521``.

Flag/artifact parity: z_dim = d + 1 (vMF in R^{d+1}), lr 3e-4, batch 64,
``--simple`` skips the VSA battery; outputs
``visualizations/d_{d}/vmf/*``, ``results/mnist-vmf-d{d}-l1-trial{n}/``,
``mnist_vmf_results.csv``, ``mnist_vmf_timing.json``.
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
    plot_interpolations,
    plot_latent_space,
    plot_reconstructions,
)
from cliffordtpu.nn import MLPVAE
from cliffordtpu.nn.losses import compute_test_metrics
from cliffordtpu.runners.safety import EMPTY_BINDING, EMPTY_CURVE, safe_eval
from cliffordtpu.train.loop import (
    fit,
    make_mlp_epoch_step,
    make_mlp_eval_step,
    make_mlp_train_step,
)
from cliffordtpu.train.schedules import linear_kl_warmup
from cliffordtpu.train.state import create_train_state
from cliffordtpu.utils import WandbLogger, ensure_dir
from cliffordtpu.vsa.capacity import (
    test_binding_unbinding_pairs as vsa_binding_unbinding,
    test_bundle_capacity as vsa_bundle_capacity,
)

KNN_SAMPLES = [100, 600, 1000]


def _jsonable(o):
    if isinstance(o, dict):
        return {k: _jsonable(v) for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_jsonable(v) for v in o]
    if hasattr(o, "tolist"):
        return o.tolist()
    return o





def _run_subprocess_eval(args, state, outdir, *, arch, distribution,
                         latent_dim, l2_normalize, rf_no_random_keys=True):
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
               "--item_memory", "means"]
        if l2_normalize:
            cmd += ["--l2_normalize"]
        if rf_no_random_keys:
            cmd += ["--rf_no_random_keys"]
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

    script_start_time = time.time()
    timing_results = {}
    enable_persistent_cache()
    os.chdir(ensure_dir(args.outdir))
    print(f"using device: {jax.devices()[0]}")

    ds = load_dataset("mnist", n_train=args.limit_train,
                      n_test=args.limit_test)
    if ds["source"] == "synthetic":
        print("WARNING: synthetic MNIST fallback in use")
    x_all = ds["x_train"].reshape(len(ds["x_train"]), -1)
    y_all = ds["y_train"]
    n_train = int(0.9 * len(x_all))
    x_train, y_train = x_all[:n_train], y_all[:n_train]
    x_val = x_all[n_train:]
    x_test = ds["x_test"].reshape(len(ds["x_test"]), -1)
    y_test = ds["y_test"]

    root_key = jax.random.PRNGKey(args.seed)
    logger = WandbLogger(args)
    final_results = []

    for d_manifold in args.d_dims:
        print(f"\n{'=' * 30}\n== vmf d={d_manifold} ==\n{'=' * 30}")
        model_z_dim = d_manifold + 1  # vmf in R^(d+1)
        agg_results = {s: [] for s in KNN_SAMPLES}
        agg_f1 = {s: [] for s in KNN_SAMPLES}
        agg_metrics = {"ll": [], "entropy": [], "recon": [], "kl": []}
        agg_mvc = []

        # batched-trial training (see mnist_clifpws.py --vmap_trials)
        vmapped = None
        if getattr(args, "vmap_trials", False) and args.n_runs > 1:
            from cliffordtpu.train.loop import (fit_trials,
                                                stack_trial_states)

            run_keys = [
                jax.random.fold_in(root_key, d_manifold * 1000 + r)
                for r in range(args.n_runs)]
            vmodel = MLPVAE(h_dim=args.h_dim, z_dim=model_z_dim,
                            distribution="vmf")
            vstates = stack_trial_states([
                create_train_state(k, vmodel, jnp.zeros((2, 784)),
                                   optimizer="adam", lr=args.lr)
                for k in run_keys])
            fit_keys = jnp.stack(
                [jax.random.fold_in(k, 1) for k in run_keys])
            t0 = time.time()
            vstates, vhists = fit_trials(
                vstates, fit_keys, x_train, x_val, vmodel,
                epochs=args.epochs, batch_size=args.batch_size,
                beta_fn=lambda e: linear_kl_warmup(e, args.warmup_epochs),
                patience=args.patience if args.patience > 0 else 10**9,
                log_fn=(lambda e, m: logger.log_metrics(
                    {"epoch": e, **m})) if logger.use else None,
            )
            vtime = time.time() - t0
            print(f"vmapped training: {args.n_runs} trials in {vtime:.2f}s "
                  f"({vtime / args.n_runs:.2f}s/trial amortized)")
            vmapped = (vstates, vhists, vtime)

        for run_idx in range(args.n_runs):
            print(f"\n--- run {run_idx + 1}/{args.n_runs} ---")
            run_start_time = time.time()
            run_key = jax.random.fold_in(root_key,
                                         d_manifold * 1000 + run_idx)
            if logger.use:
                logger.start_run(f"vmf-d{d_manifold}-run{run_idx + 1}", args)

            model = MLPVAE(h_dim=args.h_dim, z_dim=model_z_dim,
                           distribution="vmf")
            train_start_time = time.time()
            if vmapped is not None:
                from cliffordtpu.train.loop import index_trial_state

                state = index_trial_state(vmapped[0], run_idx)
                history = vmapped[1][run_idx]
                train_time = vmapped[2] / args.n_runs  # amortized
            else:
                state = create_train_state(run_key, model,
                                           jnp.zeros((2, 784)),
                                           optimizer="adam", lr=args.lr)
                state, history = fit(
                    state, make_mlp_train_step(model),
                    make_mlp_eval_step(model),
                    jax.random.fold_in(run_key, 1), x_train, x_val,
                    epochs=args.epochs, batch_size=args.batch_size,
                    beta_fn=lambda e: linear_kl_warmup(
                        e, args.warmup_epochs),
                    patience=args.patience if args.patience > 0 else 10**9,
                    log_fn=(lambda e, m: logger.log_metrics(
                        {"epoch": e, **m}))
                    if logger.use else None,
                    epoch_step=(make_mlp_epoch_step(model)
                                if getattr(args, "scan_epochs", False)
                                else None),
                )
                train_time = time.time() - train_start_time
            best_val_loss = history["best_val"]
            print(f"training time: {train_time:.2f}s")

            eval_start_time = time.time()
            vis_dir_pre = ensure_dir(f"visualizations/d_{d_manifold}/vmf")
            did_sub, sub_metrics, sub_vsa = False, {}, {}
            if getattr(args, "eval_subprocess", False) and not args.simple:
                did_sub, sub_metrics, sub_vsa = _run_subprocess_eval(
                    args, state, vis_dir_pre, arch="mlp",
                    distribution="vmf", latent_dim=model_z_dim,
                    l2_normalize=False)

            def stage(label, fn, default=None):
                if did_sub:
                    return default
                return safe_eval(label, fn, default)

            eval_ctx, eval_dev = _eval_context()
            eval_ctx.__enter__()
            eval_params = (jax.device_put(state.params, eval_dev)
                           if eval_dev is not None else state.params)
            handle = ModelHandle(model, eval_params)
            eval_root = (jax.device_put(run_key, eval_dev)
                         if eval_dev is not None else run_key)
            ekey = jax.random.fold_in(eval_root, 2)

            test_metrics = safe_eval(
                "compute_test_metrics",
                lambda: compute_test_metrics(
                    ekey, model, eval_params,
                    _batches(x_test, y_test, 1024)),
                default={"ll": float("nan"), "entropy": float("nan"),
                         "recon": float("nan"), "kl": float("nan")})
            for m in ["ll", "entropy", "recon", "kl"]:
                agg_metrics[m].append(test_metrics[m])
            print(f"  LL={test_metrics['ll']:.2f}  "
                  f"L[q]={test_metrics['entropy']:.2f}  "
                  f"RE={test_metrics['recon']:.2f}  "
                  f"KL={test_metrics['kl']:.2f}")

            knn_results = stage(
                "knn_evaluation",
                lambda: perform_knn_evaluation(
                    handle, x_train, y_train, x_test, y_test,
                    [s for s in KNN_SAMPLES if s <= len(x_train)], key=ekey),
                default={})
            if did_sub:
                knn_results = {k: v for k, v in sub_metrics.items()
                               if k.startswith("knn_")}
            for n in KNN_SAMPLES:
                if f"knn_acc_{n}" in knn_results:
                    agg_results[n].append(knn_results[f"knn_acc_{n}"])
                    agg_f1[n].append(knn_results[f"knn_f1_{n}"])

            if not args.simple:
                vis_dir = ensure_dir(f"visualizations/d_{d_manifold}/vmf")
                deconv_dir = ensure_dir(f"{vis_dir}/deconv")
                x_sub, y_sub = x_test[:500], y_test[:500]

                self_bind = stage(
                    "self_binding(*)",
                    lambda: test_self_binding(
                        handle, x_sub, y_sub, vis_dir, unbind_method="*",
                        key=ekey),
                    default=dict(EMPTY_BINDING))
                self_bind_deconv = stage(
                    "self_binding(†)",
                    lambda: test_self_binding(
                        handle, x_sub, y_sub, deconv_dir, unbind_method="†",
                        key=ekey),
                    default=dict(EMPTY_BINDING))

                n_mem = min(500, len(x_test))
                item_memory = stage(
                    "item_memory",
                    lambda: handle.latent_mu(x_test[:n_mem], ekey))

                bundle_cap_raw = stage(
                    "bundle_capacity",
                    lambda: vsa_bundle_capacity(
                        d=item_memory.shape[-1], n_items=n_mem,
                        k_range=list(range(5, 51, 5)),
                        n_trials=args.vsa_trials, plot=True,
                        save_dir=vis_dir, item_memory=item_memory, key=ekey),
                    default=dict(EMPTY_CURVE))

                rf_variants = [
                    (True, "*", vis_dir, "role_filler_capacity"),
                    (False, "*", vis_dir, "role_filler_no_random_keys"),
                    (True, "†", deconv_dir, "role_filler_capacity_deconv"),
                    (False, "†", deconv_dir,
                     "role_filler_no_random_keys_deconv"),
                ]
                rf_results = {}
                for bind_rand, ubmethod, save_d, rf_name in rf_variants:
                    rf_res = stage(
                        f"role_filler({rf_name})",
                        lambda ub=ubmethod, sd=save_d, br=bind_rand:
                            vsa_binding_unbinding(
                                d=item_memory.shape[-1], n_items=n_mem,
                                k_range=list(range(2, 21, 2)),
                                n_trials=args.vsa_trials, plot=True,
                                unbind_method=ub, save_dir=sd,
                                item_memory=item_memory,
                                bind_with_random=br, key=ekey),
                        default=dict(EMPTY_CURVE))
                    rf_results[rf_name] = rf_res
                    default_plot = os.path.join(save_d,
                                                "role_filler_capacity.png")
                    if (os.path.exists(default_plot)
                            and rf_name != "role_filler_capacity"):
                        os.rename(default_plot,
                                  os.path.join(save_d, f"{rf_name}.png"))

                stage("pairwise_bind_bundle",
                          lambda: test_pairwise_bind_bundle_decode(
                              handle, x_sub, y_sub, vis_dir,
                              img_shape=(28, 28, 1),
                              class_names=[str(i) for i in range(10)],
                              key=ekey))
                stage("cross_class_bind_unbind",
                          lambda: test_cross_class_bind_unbind(
                              handle, x_sub, y_sub, vis_dir,
                              img_shape=(28, 28, 1), class_a=6, class_b=9,
                              key=ekey))

                stage("reconstructions", lambda: plot_reconstructions(
                    handle, x_test,
                    os.path.join(vis_dir, "reconstructions.png"), key=ekey))
                stage("interpolations", lambda: plot_interpolations(
                    handle, x_test, y_test,
                    os.path.join(vis_dir, "interpolations.png"), key=ekey))
                stage("tsne", lambda: plot_latent_space(
                    handle, x_test, y_test,
                    os.path.join(vis_dir, "tsne.png"),
                    n_plot=min(1000, len(x_test)), key=ekey))

                mean_vector_acc = stage(
                    "mean_vector_cosine",
                    lambda: evaluate_mean_vector_cosine(
                        handle, x_test, y_test,
                        compute_class_means(
                            handle, x_train[:5000], y_train[:5000],
                            max_per_class=1000, key=ekey),
                        key=ekey)[0],
                    default=0.0)
                if not did_sub:
                    print(f"  mean vector cosine acc: "
                          f"{mean_vector_acc:.4f}")
                    agg_mvc.append(float(mean_vector_acc))

                if did_sub:
                    bundle_cap_raw = sub_vsa.get(
                        "bundle_cap", dict(EMPTY_CURVE))
                    rf_results = {"role_filler_no_random_keys":
                                  sub_vsa.get("role_filler",
                                              dict(EMPTY_CURVE))}
                    self_bind = {**EMPTY_BINDING,
                                 **sub_vsa.get("self_binding_star", {})}
                    self_bind_deconv = {
                        **EMPTY_BINDING,
                        **sub_vsa.get("self_binding_dagger", {})}
                    mean_vector_acc = sub_metrics.get(
                        "mean_vector_cosine_acc", 0.0)
                    agg_mvc.append(float(mean_vector_acc))
                role_filler_raw = rf_results.get(
                    "role_filler_no_random_keys", {})
                trial_dir = ensure_dir(
                    f"results/mnist-vmf-d{d_manifold}-l1-trial{run_idx + 1}")
                raw_vsa = {
                    "bundle_cap": bundle_cap_raw,
                    "role_filler": role_filler_raw,
                    "self_binding_star": {
                        "k_values": self_bind.get("k_values", []),
                        "k_sims": self_bind.get("k_sims", []),
                    },
                    "self_binding_dagger": {
                        "k_values": self_bind_deconv.get("k_values", []),
                        "k_sims": self_bind_deconv.get("k_sims", []),
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

            if logger.use:
                logger.log_summary({
                    **{k: v for k, v in knn_results.items()
                       if k.startswith("knn_")},
                    "test/ll": test_metrics["ll"],
                    "test/entropy": test_metrics["entropy"],
                    "test/recon": test_metrics["recon"],
                    "test/kl": test_metrics["kl"],
                })
                logger.finish_run()

            eval_ctx.__exit__(None, None, None)
            eval_time = time.time() - eval_start_time
            run_time = time.time() - run_start_time
            timing_results[f"vmf_d{d_manifold}_run{run_idx + 1}"] = {
                "train_time_s": train_time,
                "eval_time_s": eval_time,
                "total_run_time_s": run_time,
            }
            print(f"eval time: {eval_time:.2f}s, total: {run_time:.2f}s")

        row = {"d": d_manifold}
        for n in KNN_SAMPLES:
            accs, f1s = agg_results[n], agg_f1[n]
            row[f"vMF_acc_{n}"] = (
                f"{np.mean(accs) * 100:.1f}±{np.std(accs) * 100:.1f}"
                if accs else "N/A")
            row[f"vMF_f1_{n}"] = (
                f"{np.mean(f1s) * 100:.1f}±{np.std(f1s) * 100:.1f}"
                if f1s else "N/A")
        row["vMF_mvc"] = (
            f"{np.mean(agg_mvc) * 100:.1f}±{np.std(agg_mvc) * 100:.1f}"
            if agg_mvc else "N/A")
        for m in ["ll", "entropy", "recon", "kl"]:
            vals = agg_metrics[m]
            row[f"vMF_{m}"] = (
                f"{np.mean(vals):.2f}±{np.std(vals):.2f}" if vals else "N/A")
        final_results.append(row)

    if final_results:
        import pandas as pd

        df = pd.DataFrame(final_results).set_index("d")
        print("\n" + "=" * 25 + " all metrics " + "=" * 25)
        print(df.to_string())
        df.to_csv("mnist_vmf_results.csv")

    timing_results["total_script_time_s"] = time.time() - script_start_time
    with open("mnist_vmf_timing.json", "w") as f:
        json.dump(timing_results, f, indent=2)
    print(f"\ntotal script time: {timing_results['total_script_time_s']:.2f}s")


def build_parser():
    parser = argparse.ArgumentParser(
        description="vMF-VAE on MNIST — minimal table runner")
    parser.add_argument("--d_dims", type=int, nargs="+",
                        default=[2, 5, 10, 20, 40])
    parser.add_argument("--h_dim", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=1000)
    parser.add_argument("--patience", type=int, default=50)
    parser.add_argument("--warmup_epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--n_runs", type=int, default=1)
    parser.add_argument("--no_wandb", action="store_true")
    parser.add_argument("--wandb_project", type=str, default="mnist-vmf")
    parser.add_argument("--simple", action="store_true")
    # extensions (defaults preserve reference behavior)
    parser.add_argument("--outdir", type=str, default=".")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit_train", type=int, default=None)
    parser.add_argument("--limit_test", type=int, default=None)
    parser.add_argument("--vsa_trials", type=int, default=20)
    parser.add_argument("--eval_subprocess", action="store_true")
    parser.add_argument("--scan_epochs", action="store_true")
    parser.add_argument("--vmap_trials", action="store_true",
                        help="train all n_runs trials simultaneously as "
                             "one vmapped XLA program (see mnist_clifpws)")
    return parser


if __name__ == "__main__":
    from cliffordtpu.utils.tpu_lock import hold_tpu_lock

    # one TPU client process at a time (ROADMAP round-4 s5/s6)
    _tpu_lock = hold_tpu_lock(label="mnist_vmf")
    run(build_parser().parse_args())
