"""Shared CNN/ViT/Hybrid experiment driver for FashionMNIST and CIFAR-10.

One engine for both ``cnn/fashion_train.py:675-1417`` and
``cnn/cifar10_train.py:363-980`` (they share the skeleton; cifar10 is the
CNN-only, slimmer-eval variant).  Artifact contract preserved:
``results/{exp_name}/{vsa_raw,metrics}.json``, comparison plots under
``results/comparisons/{dataset}``, ``{dataset}_results.csv``,
``{runner}_timing.json``.
"""

from __future__ import annotations

import json
import math
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from cliffordtpu.data import load_dataset
from cliffordtpu.eval import ModelHandle
from cliffordtpu.eval.binding import (
    test_cross_class_bind_unbind,
    test_self_binding,
)
from cliffordtpu.eval.class_means import (
    compute_class_means,
    evaluate_mean_vector_cosine,
)
from cliffordtpu.eval.fid import compute_fid
from cliffordtpu.eval.knn import perform_knn_evaluation
from cliffordtpu.eval.plots import (
    get_fixed_interp_pairs,
    plot_decoded_bundles,
    plot_latent_interpolations,
    plot_latent_space,
    plot_reconstructions,
)
from cliffordtpu.eval.tables import (
    plot_across_dims_comparison,
    plot_cross_dist_comparison_dim,
)
from cliffordtpu.nn import CNNVAE, CliffordARVAE, HybridVAE
from cliffordtpu.runners.safety import EMPTY_BINDING, EMPTY_CURVE, safe_eval
from cliffordtpu.train.checkpoint import delete_checkpoint, save_checkpoint
from cliffordtpu.train.loop import (
    make_cnn_epoch_step,
    make_cnn_eval_step,
    make_cnn_train_step,
    stack_epoch_batches,
)
from cliffordtpu.train.schedules import cyclical_kl_beta
from cliffordtpu.train.state import create_train_state
from cliffordtpu.utils import (CLASS_NAMES, WandbLogger, ensure_dir,
                               stable_hash)
from cliffordtpu.vsa.capacity import (
    test_binding_unbinding_pairs as vsa_binding_unbinding,
    test_bundle_capacity as vsa_bundle_capacity,
    test_per_class_bundle_capacity_k_items,
)
from cliffordtpu.vsa.ops import (
    bind as vsa_bind,
    normalize_vectors,
    similarity,
    unbind as vsa_unbind,
    unitary_init as vsa_unitary_init,
)

BC_K_RANGE = list(range(5, 51, 5))
RF_K_RANGE = list(range(2, 21, 2))




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


# merge-on-write artifact helpers shared with the MLP runner
from cliffordtpu.utils.artifacts import (  # noqa: E402
    jsonable as _jsonable,
    load_json as _load_json,
    merge_across_dims as _merge_across_dims,
    merge_json_write as _merge_json_write,
)


def _run_subprocess_eval(args, state, output_dir, dataset_name,
                         handle_latent_dim):
    """Save checkpoint, run scripts/eval_checkpoint.py in a fresh CPU-only
    process, read its metrics/vsa_raw back.  Returns (ok, metrics, vsa)."""
    import subprocess
    import sys as _sys

    try:
        save_checkpoint(output_dir, state, step=0)
        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "scripts",
            "eval_checkpoint.py")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        cmd = [
            _sys.executable, script,
            "--ckpt", output_dir,
            "--arch", getattr(args, "arch", "cnn"),
            "--distribution", args._actual_dist,
            "--latent_dim", str(handle_latent_dim),
            "--dataset", dataset_name,
            "--outdir", output_dir,
            "--vsa_trials", str(args.vsa_trials),
            "--fid_samples", str(args.fid_samples),
        ]
        if getattr(args, "_actual_l2", False):
            cmd += ["--l2_normalize"]
        if getattr(args, "scan_layers_model", False):
            cmd += ["--scan_layers"]  # param tree is layer-stacked
        if getattr(args, "fused_proj", False):
            cmd += ["--fused_proj"]  # fused wqkv/w13 param tree
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
        with open(os.path.join(output_dir, "metrics.json")) as fh:
            metrics = json.load(fh)
        with open(os.path.join(output_dir, "vsa_raw.json")) as fh:
            vsa = json.load(fh)
        if not args.keep_ckpts:
            delete_checkpoint(output_dir)
        return True, metrics, vsa
    except Exception as e:
        print(f"warning: subprocess eval errored: {e!r}")
        return False, {}, {}


def build_model(args, dist_name: str, latent_dim: int, in_channels: int):
    """Model construction per arch (``fashion_train.py:788-822``)."""
    if dist_name == "gaussian_nol2":
        actual_dist, l2_norm = "gaussian", False
    elif dist_name == "gaussian":
        actual_dist, l2_norm = "gaussian", args.l2_norm
    else:
        actual_dist, l2_norm = dist_name, False
    arch = getattr(args, "arch", "cnn")
    if arch == "cnn":
        model = CNNVAE(
            latent_dim=latent_dim, in_channels=in_channels,
            distribution=actual_dist, recon_loss_type=args.recon_loss,
            l1_weight=args.l1_weight, l2_normalize=l2_norm,
            use_learnable_beta=args.use_learnable_beta, img_size=32)
    elif arch == "hybrid":
        model_latent_dim = max(4, latent_dim // 16)  # fashion_train.py:799
        model = HybridVAE(
            latent_dim=model_latent_dim, in_channels=in_channels,
            distribution=actual_dist, recon_loss_type=args.recon_loss,
            l1_weight=args.l1_weight, l2_normalize=l2_norm,
            use_learnable_beta=args.use_learnable_beta, img_size=32)
    else:  # vit
        model = CliffordARVAE(
            latent_dim=latent_dim, image_size=32, in_channels=in_channels,
            distribution=actual_dist, recon_loss_type=args.recon_loss,
            l1_weight=args.l1_weight, l2_normalize=l2_norm,
            use_learnable_beta=args.use_learnable_beta,
            scan_layers=bool(getattr(args, "scan_layers_model", False)),
            fused_proj=bool(getattr(args, "fused_proj", False)))
    return model


def train_model(args, model, x_train, x_test, run_key, logger=None):
    """Train with cyclic beta + best-on-(recon+kld) selection
    (``fashion_train.py:833-893``).

    ``--mesh dp|N|NxM`` trains under pjit on a ("data","model") device
    mesh — batch sharded over "data", params per the TP rules (replicated
    in pure DP), optionally FSDP via ``--mesh_mode fsdp``.  Same math as
    the single-device step (tests/test_parallel.py), unlike the reference
    which hardcodes one device (``cnn/fashion_train.py:46-50``).
    """
    mesh = None
    mesh_spec = getattr(args, "mesh", None)
    if mesh_spec:
        from cliffordtpu.parallel.data import make_global_batch
        from cliffordtpu.parallel.mesh import create_mesh, parse_mesh_spec
        from cliffordtpu.parallel.sharding import (
            make_sharded_cnn_train_step,
            shard_state,
        )

        if getattr(args, "scan_epochs", False):
            raise ValueError("--mesh is not supported with --scan_epochs")
        mesh = create_mesh(parse_mesh_spec(mesh_spec))
        ndata = mesh.shape["data"]
        if args.batch_size % ndata != 0:
            raise ValueError(
                f"--batch_size {args.batch_size} must be divisible by the "
                f"data axis ({ndata}) of mesh {mesh_spec}")
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
              f"mode {getattr(args, 'mesh_mode', 'replicated')}")

    state = create_train_state(
        run_key, model, jnp.asarray(x_train[:2]), optimizer="adamw",
        lr=args.cur_lr, clip_norm=1.0,
        sigma_lr_scale=0.1 if args.use_learnable_beta else None,
        accum_steps=int(getattr(args, "grad_accum", 1) or 1))
    use_scan = bool(getattr(args, "scan_epochs", False))
    if mesh is not None:
        state = shard_state(mesh, state,
                            mode=getattr(args, "mesh_mode", "replicated"))
        train_step = make_sharded_cnn_train_step(model, mesh)
        epoch_step = None

        def to_device(batch):
            return make_global_batch(mesh, np.ascontiguousarray(batch))
    else:
        train_step = None if use_scan else make_cnn_train_step(model)
        epoch_step = make_cnn_epoch_step(model) if use_scan else None
        to_device = jnp.asarray
    eval_step = make_cnn_eval_step(model)

    n = len(x_train)
    steps = max(1, n // args.batch_size)
    best = float("inf")
    best_params = jax.tree_util.tree_map(lambda a: a.copy(),
                                         state.params)
    patience_counter = 0
    epoch_t0 = time.time()
    for epoch in range(args.epochs):
        beta = (1.0 if args.use_learnable_beta else cyclical_kl_beta(
            epoch, args.warmup_epochs, args.cycle_epochs, args.min_beta,
            args.max_beta))
        beta_arr = jnp.float32(beta)
        ekey = jax.random.fold_in(run_key, epoch + 1)
        perm = np.asarray(jax.random.permutation(ekey, n))
        if use_scan:
            # --scan_epochs: one XLA program per epoch (lax.scan over the
            # minibatch axis); same key stream as the per-step path
            batches = stack_epoch_batches(x_train, perm, steps,
                                          args.batch_size)
            state, ep_losses = epoch_step(state, batches, ekey, beta_arr)
            tr_dev = (ep_losses["total_loss"].sum(),
                      ep_losses["recon_loss"].sum(),
                      ep_losses["kld_loss"].sum(),
                      ep_losses["grad_norm"].sum())
        else:
            tr_dev = None
            for s in range(steps):
                xb = to_device(
                    x_train[perm[s * args.batch_size:
                                 (s + 1) * args.batch_size]])
                state, losses = train_step(
                    state, xb, jax.random.fold_in(ekey, s + 1), beta_arr)
                cur = (losses["total_loss"], losses["recon_loss"],
                       losses["kld_loss"], losses["grad_norm"])
                # device-side accumulation: one transfer per epoch
                tr_dev = cur if tr_dev is None else tuple(
                    a + b for a, b in zip(tr_dev, cur))
        tr = {"total": float(tr_dev[0]), "recon": float(tr_dev[1]),
              "kld": float(tr_dev[2]), "grad_norm": float(tr_dev[3])}

        # test epoch (beta=1 like test_epoch, fashion_train.py:113)
        te = {"total": 0.0, "recon": 0.0, "kld": 0.0}
        n_te = 0
        for s in range(0, len(x_test), args.batch_size):
            xb = jnp.asarray(x_test[s:s + args.batch_size])
            v = eval_step(state.params, xb,
                          jax.random.fold_in(ekey, 10_000 + s),
                          jnp.float32(1.0))
            te["total"] += float(v["total_loss"]) * xb.shape[0]
            te["recon"] += float(v["recon_loss"]) * xb.shape[0]
            te["kld"] += float(v["kld_loss"]) * xb.shape[0]
            n_te += xb.shape[0]
        for k in te:
            te[k] /= max(1, n_te)

        val = te["recon"] + te["kld"]
        if np.isfinite(val) and val < best:
            best = val
            # deep copy — the donated train_step invalidates these buffers
            best_params = jax.tree_util.tree_map(
                lambda a: a.copy(), state.params)
            patience_counter = 0
        else:
            patience_counter += 1

        # wall-time per epoch on stdout: epoch 0 carries the compiles, so a
        # slow trial log shows at a glance whether compile or steps dominate
        print(f"epoch {epoch + 1}/{args.epochs}: "
              f"train {tr['total'] / steps:.2f} test {val:.2f} "
              f"({time.time() - epoch_t0:.1f}s)", flush=True)
        epoch_t0 = time.time()

        if logger and logger.use:
            logger.log_metrics({
                "epoch": epoch,
                "train/total_loss": tr["total"] / steps,
                "train/recon_loss": tr["recon"] / steps,
                "train/kld_loss": tr["kld"] / steps,
                # epoch-mean pre-clip global grad norm: the JAX stand-in
                # for torch ``wandb.watch(model, log="gradients")``
                # (reference wandb_utils.py:306-310, fashion_train.py:884)
                "train/grad_norm": tr["grad_norm"] / steps,
                "test/total_loss": te["total"],
                "test/recon_loss": te["recon"],
                "test/kld_loss": te["kld"],
                "best_test_total_loss": best,
                **({} if args.use_learnable_beta else {"beta": beta}),
            })
        if args.patience > 0 and patience_counter >= args.patience:
            print(f"Early stopping at epoch {epoch + 1}")
            break

    state = state.replace(params=best_params)
    return state, best, eval_step


def run_cnn_experiments(args, dataset_name: str, timing_name: str,
                        full_eval: bool = True):
    """Main sweep loop shared by the fashion and cifar10 runners."""
    from cliffordtpu.utils.compile_cache import enable_persistent_cache

    script_start_time = time.time()
    timing_results: Dict = {}
    enable_persistent_cache()  # ~100-200 s/program saved per fresh process
    os.chdir(ensure_dir(args.outdir))
    print(f"Device: {jax.devices()[0]}")
    logger = WandbLogger(args)

    in_channels = 3 if dataset_name == "cifar10" else 1
    IMG_SHAPE = (32, 32, in_channels)
    class_names = (
        ["tshirt", "trouser", "pullover", "dress", "coat", "sandal",
         "shirt", "sneaker", "bag", "boot"]
        if dataset_name == "fashionmnist"
        else CLASS_NAMES["mnist"] if dataset_name == "mnist32"
        else CLASS_NAMES["cifar10"])

    ds = load_dataset(dataset_name, n_train=args.limit_train,
                      n_test=args.limit_test)
    if ds["source"] == "synthetic":
        if getattr(args, "require_real", False):
            raise SystemExit(
                f"--require_real: no real {dataset_name} found (searched "
                f"$CLIFFORDTPU_DATA_DIR, ./data, /root/data — note the "
                f"runner chdirs into --outdir, so pass an ABSOLUTE path)")
        print(f"WARNING: synthetic {dataset_name} fallback in use")
    timing_results["data_source"] = ds["source"]
    x_train_full, y_train_full = ds["x_train"], ds["y_train"]
    x_test_full, y_test_full = ds["x_test"], ds["y_test"]

    # class exclusion (``fashion_train.py:521-536``)
    if args.exclude_class >= 0:
        tr_mask = y_train_full != args.exclude_class
        te_mask = y_test_full != args.exclude_class
        x_excl = x_test_full[~te_mask]
        x_train, y_train = x_train_full[tr_mask], y_train_full[tr_mask]
        x_test, y_test = x_test_full[te_mask], y_test_full[te_mask]
        print(f"excluding class {args.exclude_class}; "
              f"excluded test set size: {len(x_excl)}")
    else:
        x_train, y_train = x_train_full, y_train_full
        x_test, y_test = x_test_full, y_test_full
        x_excl = None

    fixed_interp_pairs = get_fixed_interp_pairs(x_test, y_test, n_pairs=5,
                                                seed=42)
    latent_dims = args.latent_dims
    distributions = args.distributions
    dist_lr = {d: args.lr for d in distributions}
    dist_lr["powerspherical"] = 1e-4  # fashion_train.py:687-692

    across_dim_results = {
        d: {"knn_100": [], "knn_600": [], "knn_1000": [], "f1_100": [],
            "f1_600": [], "f1_1000": [], "mean_cosine": [], "dims": []}
        for d in distributions}
    trial_metrics: Dict = {}
    root_key = jax.random.PRNGKey(args.seed)

    for latent_dim in latent_dims:
        dim_results: Dict = {}
        for dist_name in distributions:
            for trial in range(args.n_trials):
                trial_num = trial + args.start_trial
                trial_suffix = (f"-trial{trial_num}"
                                if (args.n_trials > 1 or args.start_trial > 1
                                    or getattr(args, "force_trial_suffix",
                                               False))
                                else "")
                exp_name = (f"{dataset_name}-{dist_name}-d{latent_dim}-"
                            f"{args.recon_loss}{trial_suffix}")
                output_dir = ensure_dir(f"results/{exp_name}")
                print(f"\n== {exp_name} ==")
                exp_start_time = time.time()
                if logger.use:
                    logger.start_run(exp_name, args)

                run_key = jax.random.fold_in(
                    root_key,
                    stable_hash(latent_dim, dist_name, trial_num) % (2**31))
                args.cur_lr = dist_lr.get(dist_name, args.lr)
                model = build_model(args, dist_name, latent_dim, in_channels)
                args._actual_dist = model.distribution
                args._actual_l2 = bool(model.l2_normalize)

                train_start_time = time.time()
                state, best, eval_step = train_model(
                    args, model, x_train, x_test, run_key, logger)
                train_time = time.time() - train_start_time
                print(f"best total loss (recon+kld): {best:.4f}, "
                      f"training time: {train_time:.2f}s")
                if args.keep_ckpts:
                    save_checkpoint(output_dir, state, step=0,
                                    best_metric=best)

                eval_start_time = time.time()

                # --eval_subprocess: run the battery in a fresh CPU-only
                # process (immune to axon runtime wedging; see CLAUDE.md)
                did_sub, sub_metrics, sub_vsa = False, {}, {}
                if getattr(args, "eval_subprocess", False):
                    did_sub, sub_metrics, sub_vsa = _run_subprocess_eval(
                        args, state, output_dir, dataset_name,
                        handle_latent_dim=latent_dim)

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
                ekey = jax.random.fold_in(eval_root, 777)

                # optional IWAE log-likelihood bound (extension beyond the
                # reference, which has IWAE only for the MLP runners).
                # Runs INSIDE the CPU eval context like the rest of the
                # battery — the axon TPU backend sporadically throws
                # per-op UNIMPLEMENTED, and a flake here would silently
                # drop the metric.
                iwae_ll = None
                if getattr(args, "iwae_samples", 0):
                    def _iwae():
                        from cliffordtpu.nn.losses import (
                            iwae_log_likelihood_cnn,
                        )

                        n_eval = min(256, len(x_test))
                        tot, bs = 0.0, 64
                        for s in range(0, n_eval, bs):
                            xb = jnp.asarray(x_test[s:s + bs])
                            tot += float(iwae_log_likelihood_cnn(
                                jax.random.fold_in(eval_root, 7700 + s),
                                model, eval_params, xb,
                                n_samples=args.iwae_samples,
                                recon_loss_type=args.recon_loss,
                            )) * len(xb)
                        ll = tot / n_eval
                        print(f"IWAE-{args.iwae_samples} test ll/image: "
                              f"{ll:.2f}")
                        return ll

                    iwae_ll = safe_eval("iwae_ll", _iwae, None)

                # item memory of flat sampled latents (:909-925)
                n_mem = min(1000, len(x_test))
                item_memory, item_labels = stage(
                    "item_memory",
                    lambda: handle.collect_flat_z(
                        x_test, y_test, ekey, limit=n_mem,
                        batch=args.batch_size),
                    default=(None, None))

                print(f"running 1-item-per-class test ({dist_name})...")
                stage(
                    "per_class_bundle",
                    lambda: test_per_class_bundle_capacity_k_items(
                        d=latent_dim, n_items=n_mem, n_classes=10,
                        items_per_class=1, n_trials=1, plot=False,
                        save_dir=output_dir, item_memory=item_memory,
                        labels=jnp.asarray(item_labels),
                        item_images=x_test[:n_mem], class_names=class_names,
                        key=ekey))

                print(f"running bundle capacity test ({dist_name})...")
                bundle_cap_raw = stage(
                    "bundle_capacity",
                    lambda: vsa_bundle_capacity(
                        d=item_memory.shape[-1], n_items=n_mem,
                        k_range=BC_K_RANGE, n_trials=args.vsa_trials,
                        plot=False, save_dir=output_dir,
                        item_memory=item_memory, baseline_d=latent_dim,
                        key=ekey),
                    default=dict(EMPTY_CURVE))

                print(f"running role-filler unbinding test ({dist_name})...")
                role_filler_raw = stage(
                    "role_filler",
                    lambda: vsa_binding_unbinding(
                        d=item_memory.shape[-1], n_items=n_mem,
                        k_range=RF_K_RANGE, n_trials=args.vsa_trials,
                        plot=False, unbind_method="*", save_dir=output_dir,
                        item_memory=item_memory, bind_with_random=True,
                        baseline_d=latent_dim, key=ekey),
                    default=dict(EMPTY_CURVE))
                rf_results = {"role_filler_capacity": role_filler_raw}

                print(f"running self-binding test ({dist_name})...")
                fourier_star = stage(
                    "self_binding(*)",
                    lambda: test_self_binding(
                        handle, x_test[:500], y_test[:500], output_dir,
                        unbind_method="*", img_shape=IMG_SHAPE, key=ekey),
                    default=dict(EMPTY_BINDING))
                deconv_dir = ensure_dir(f"{output_dir}/deconv")
                fourier_perp = stage(
                    "self_binding(†)",
                    lambda: test_self_binding(
                        handle, x_test[:500], y_test[:500], deconv_dir,
                        unbind_method="†", img_shape=IMG_SHAPE, key=ekey),
                    default=dict(EMPTY_BINDING))

                stage("reconstructions", lambda: plot_reconstructions(
                    handle, x_test, f"{output_dir}/reconstructions.png",
                    img_shape=IMG_SHAPE, key=ekey))
                if trial == 0:
                    stage("tsne", lambda: plot_latent_space(
                        handle, x_test, y_test, f"{output_dir}/tsne.png",
                        n_plot=min(2000, len(x_test)), key=ekey))
                if full_eval:
                    stage("decoded_bundles",
                              lambda: plot_decoded_bundles(
                                  handle, x_test, y_test,
                                  f"{output_dir}/decoded_bundles.png",
                                  class_names=class_names,
                                  n_samples=min(500, len(x_test)), key=ekey))
                    stage("latent_interpolations",
                              lambda: plot_latent_interpolations(
                                  handle, fixed_interp_pairs, output_dir,
                                  n_steps=10, img_shape=IMG_SHAPE, key=ekey))

                print("running knn evaluation...")
                knn_metrics = stage(
                    "knn_evaluation",
                    lambda: perform_knn_evaluation(
                        handle, x_train, y_train, x_test, y_test,
                        [s for s in (100, 600, 1000) if s <= len(x_train)],
                        key=ekey),
                    default={})

                mean_vector_acc = stage(
                    "mean_vector_cosine",
                    lambda: evaluate_mean_vector_cosine(
                        handle, x_test, y_test,
                        compute_class_means(
                            handle, x_train[:5000], y_train[:5000],
                            max_per_class=1000, batch=args.batch_size,
                            key=ekey),
                        batch=args.batch_size, key=ekey)[0],
                    default=0.0)
                print("mean_vector_cosine_acc: ", mean_vector_acc)

                model_latent = handle.latent_dim
                fid_res = stage(
                    "generation_fid",
                    lambda: compute_fid(
                        handle, x_test, model.distribution, model_latent,
                        in_channels=in_channels,
                        n_samples=min(args.fid_samples, len(x_test)),
                        batch_size=256, key=ekey),
                    default={"fid": float("nan"),
                             "fid_features": "failed"})
                gen_fid = fid_res["fid"]
                print(f"generation FID: {gen_fid:.2f} "
                      f"({fid_res['fid_features']})")

                if did_sub:
                    knn_metrics = {k: v for k, v in sub_metrics.items()
                                   if k.startswith("knn_")}
                    mean_vector_acc = sub_metrics.get(
                        "mean_vector_cosine_acc", 0.0)
                    fid_res = {
                        "fid": sub_metrics.get("generation_fid",
                                               float("nan")),
                        "fid_features": sub_metrics.get("fid_features",
                                                        "subprocess"),
                    }
                    gen_fid = fid_res["fid"]
                    bundle_cap_raw = sub_vsa.get(
                        "bundle_cap", dict(EMPTY_CURVE))
                    role_filler_raw = sub_vsa.get(
                        "role_filler", dict(EMPTY_CURVE))
                    rf_results = {"role_filler_capacity": role_filler_raw}
                    fourier_star = {**EMPTY_BINDING,
                                    **sub_vsa.get("self_binding_star", {})}
                    fourier_perp = {**EMPTY_BINDING,
                                    **sub_vsa.get("self_binding_dagger", {})}
                    for fr in (fourier_star, fourier_perp):
                        if fr.get("k_sims"):
                            fr["binding_k_self_similarity"] = float(
                                fr["k_sims"][-1])

                if trial == 0 and not did_sub:
                    print("running cross-class bind/unbind test...")
                    if dataset_name in ("fashionmnist", "mnist32"):
                        # fashion uses the reference's fixed 5v6 pair;
                        # digits use 6v9 like mnist_clifpws.py:451-455
                        ca, cb = ((5, 6) if dataset_name == "fashionmnist"
                                  else (6, 9))
                        stage("cross_class",
                                  lambda: test_cross_class_bind_unbind(
                                      handle, x_test[:500], y_test[:500],
                                      output_dir, img_shape=IMG_SHAPE,
                                      class_a=ca, class_b=cb, key=ekey))
                    else:
                        rng = np.random.RandomState(trial_num)
                        for _ in range(2):
                            a, b = rng.choice(10, 2, replace=False)
                            stage("cross_class",
                                      lambda a=a, b=b:
                                      test_cross_class_bind_unbind(
                                          handle, x_test[:500],
                                          y_test[:500], output_dir,
                                          img_shape=IMG_SHAPE,
                                          class_a=int(a), class_b=int(b),
                                          key=ekey))

                excluded_metrics = {}
                if x_excl is not None and len(x_excl):
                    print(f"\nevaluating on excluded class "
                          f"{args.exclude_class}...")
                    te = {"total": 0.0, "recon": 0.0, "kld": 0.0}
                    n_e = 0
                    for s in range(0, len(x_excl), args.batch_size):
                        xb = jnp.asarray(x_excl[s:s + args.batch_size])
                        v = eval_step(eval_params, xb,
                                      jax.random.fold_in(ekey, 20_000 + s),
                                      jnp.float32(1.0))
                        for k, lk in [("total", "total_loss"),
                                      ("recon", "recon_loss"),
                                      ("kld", "kld_loss")]:
                            te[k] += float(v[lk]) * xb.shape[0]
                        n_e += xb.shape[0]
                    prefix = f"excluded_class_{args.exclude_class}"
                    excluded_metrics = {
                        f"{prefix}/test_total_loss": te["total"] / n_e,
                        f"{prefix}/test_recon_loss": te["recon"] / n_e,
                        f"{prefix}/test_kld_loss": te["kld"] / n_e,
                    }
                    plot_reconstructions(
                        handle, x_excl,
                        f"{output_dir}/reconstructions_excluded_class_"
                        f"{args.exclude_class}.png",
                        img_shape=IMG_SHAPE, key=ekey)

                fourier_metrics = {}
                fourier_metrics.update({
                    f"*/{k}": v for k, v in fourier_star.items()
                    if isinstance(v, (int, float, bool))})
                fourier_metrics.update({
                    f"†/{k}": v for k, v in fourier_perp.items()
                    if isinstance(v, (int, float, bool))})

                summary = {
                    "final_best_total_loss": best,
                    **fourier_metrics,
                    **knn_metrics,
                    **excluded_metrics,
                    "mean_vector_cosine_acc": float(mean_vector_acc),
                    **({"generation_fid": gen_fid}
                       if gen_fid is not None and not math.isnan(gen_fid)
                       else {}),
                    **({"iwae_ll": iwae_ll,
                        "iwae_samples": args.iwae_samples}
                       if iwae_ll is not None else {}),
                    "fid_features": fid_res["fid_features"],
                }
                if logger.use:
                    logger.log_summary(summary)
                    logger.finish_run()

                raw_vsa = {
                    "bundle_cap": bundle_cap_raw,
                    "role_filler": role_filler_raw,
                    "self_binding_star": {
                        "k_values": fourier_star.get("k_values", []),
                        "k_sims": fourier_star.get("k_sims", []),
                    },
                    "self_binding_dagger": {
                        "k_values": fourier_perp.get("k_values", []),
                        "k_sims": fourier_perp.get("k_sims", []),
                    },
                }
                with open(f"{output_dir}/vsa_raw.json", "w") as f:
                    json.dump(_jsonable(raw_vsa), f)
                with open(f"{output_dir}/metrics.json", "w") as f:
                    json.dump(_jsonable(summary), f, indent=2)
                print(f"saved metrics to {output_dir}/metrics.json")

                if not args.keep_ckpts:
                    delete_checkpoint(output_dir)

                eval_ctx.__exit__(None, None, None)
                eval_time = time.time() - eval_start_time
                exp_time = time.time() - exp_start_time
                timing_results[exp_name] = {
                    "train_time_s": train_time,
                    "eval_time_s": eval_time,
                    "total_exp_time_s": exp_time,
                }
                print(f"eval time: {eval_time:.2f}s, "
                      f"total exp time: {exp_time:.2f}s")

                dim_results[dist_name] = {
                    "bundle_cap": bundle_cap_raw,
                    "role_filler": role_filler_raw,
                    "role_filler_variants": rf_results,
                    "self_binding_k_sims": fourier_star.get("k_sims", []),
                    "self_binding_k_values": fourier_star.get("k_values", []),
                    "knn_acc": knn_metrics.get("knn_acc_1000", 0.0),
                    "mean_cosine": float(mean_vector_acc),
                }
                key_t = (latent_dim, dist_name)
                trial_metrics.setdefault(key_t, []).append({
                    "knn_acc_100": knn_metrics.get("knn_acc_100", 0.0),
                    "knn_acc_600": knn_metrics.get("knn_acc_600", 0.0),
                    "knn_acc_1000": knn_metrics.get("knn_acc_1000", 0.0),
                    "knn_f1_100": knn_metrics.get("knn_f1_100", 0.0),
                    "knn_f1_600": knn_metrics.get("knn_f1_600", 0.0),
                    "knn_f1_1000": knn_metrics.get("knn_f1_1000", 0.0),
                    "mvc": float(mean_vector_acc),
                    "fid": (gen_fid if gen_fid is not None
                            and not math.isnan(gen_fid) else float("nan")),
                    "best_loss": best,
                })
                for kk, mk in [("knn_100", "knn_acc_100"),
                               ("knn_600", "knn_acc_600"),
                               ("knn_1000", "knn_acc_1000"),
                               ("f1_100", "knn_f1_100"),
                               ("f1_600", "knn_f1_600"),
                               ("f1_1000", "knn_f1_1000")]:
                    across_dim_results[dist_name][kk].append(
                        knn_metrics.get(mk, 0.0))
                across_dim_results[dist_name]["mean_cosine"].append(
                    float(mean_vector_acc))
                across_dim_results[dist_name]["dims"].append(latent_dim)

        # per-dim reference curves + cross-dist comparison (:1288-1371)
        try:
            ckey = jax.random.fold_in(root_key, latent_dim)
            ref_items = normalize_vectors(
                jax.random.normal(ckey, (1000, latent_dim)))
            ref_bc = vsa_bundle_capacity(
                d=latent_dim, n_items=1000, k_range=BC_K_RANGE,
                n_trials=args.vsa_trials, item_memory=ref_items, key=ckey)
            ref_rf = vsa_binding_unbinding(
                d=latent_dim, n_items=1000, k_range=RF_K_RANGE,
                n_trials=args.vsa_trials, unbind_method="*",
                item_memory=ref_items, bind_with_random=True, key=ckey)
            k_max = 50

            def _self_bind_curve(z):
                sims = []
                cur = z
                for m in range(1, k_max + 1):
                    cur = vsa_bind(cur, z)
                    rec = cur
                    for _ in range(m):
                        rec = vsa_unbind(rec, z, method="*")
                    sims.append(float(similarity(rec, z)))
                return sims

            z_ref = normalize_vectors(
                jax.random.normal(jax.random.fold_in(ckey, 1),
                                  (latent_dim,)))
            dim_results["random_hrr"] = {
                "bundle_cap": ref_bc, "role_filler": ref_rf,
                "self_binding_k_sims": _self_bind_curve(z_ref),
                "self_binding_k_values": list(range(1, k_max + 1)),
            }
            uni_items = normalize_vectors(vsa_unitary_init(
                jax.random.fold_in(ckey, 2), 1000, latent_dim))
            uni_bc = vsa_bundle_capacity(
                d=latent_dim, n_items=1000, k_range=BC_K_RANGE,
                n_trials=args.vsa_trials, item_memory=uni_items, key=ckey)
            uni_rf = vsa_binding_unbinding(
                d=latent_dim, n_items=1000, k_range=RF_K_RANGE,
                n_trials=args.vsa_trials, unbind_method="*",
                item_memory=uni_items, bind_with_random=True, key=ckey)
            z_uni = normalize_vectors(vsa_unitary_init(
                jax.random.fold_in(ckey, 3), 1, latent_dim)[0])
            dim_results["unitary"] = {
                "bundle_cap": uni_bc, "role_filler": uni_rf,
                "self_binding_k_sims": _self_bind_curve(z_uni),
                "self_binding_k_values": list(range(1, k_max + 1)),
            }
            comp_dir = ensure_dir(f"results/comparisons/{dataset_name}")
            # merge-on-write sidecar so per-family invocations aggregate
            dim_merged = _merge_json_write(
                f"{comp_dir}/dim{latent_dim}_data.json", dim_results)
            comp_path = plot_cross_dist_comparison_dim(
                dim_merged, latent_dim, dataset_name, comp_dir)
            print(f"saved cross-dist comparison to {comp_path}")
        except Exception as e:
            print(f"warning: cross-dist comparison failed for "
                  f"d={latent_dim}: {e}")

    try:
        comp_dir = ensure_dir(f"results/comparisons/{dataset_name}")
        across_merged = _merge_across_dims(
            f"{comp_dir}/across_dims_data.json", across_dim_results)
        dims_union = sorted({d for v in across_merged.values()
                             for d in v.get("dims", [])})
        across_path = plot_across_dims_comparison(
            across_merged, dims_union, dataset_name, comp_dir)
        print(f"saved across-dims comparison to {across_path}")
    except Exception as e:
        print(f"warning: across-dims comparison failed: {e}")

    # unified CSV (``fashion_train.py:1382-1410``) — regenerated from a
    # merge-on-write sidecar so sliced per-family runs aggregate into one CSV
    if trial_metrics:
        import pandas as pd

        merged_trials = _merge_json_write(
            f"{dataset_name}_trial_metrics.json",
            {f"{ld}|{dist}": trials
             for (ld, dist), trials in trial_metrics.items()})
        all_trials = {}
        for key, trials in merged_trials.items():
            ld, dist = key.split("|", 1)
            all_trials[(int(ld), dist)] = trials

        rows = []
        for (ldim, dist), trials in sorted(all_trials.items()):
            row = {"d": ldim, "dist": dist}
            for metric in ["knn_acc_100", "knn_acc_600", "knn_acc_1000",
                           "knn_f1_100", "knn_f1_600", "knn_f1_1000", "mvc"]:
                vals = [t[metric] * 100 for t in trials]
                row[metric] = (f"{np.mean(vals):.1f}±{np.std(vals):.1f}"
                               if len(vals) > 1 else f"{vals[0]:.1f}")
            fid_vals = [t["fid"] for t in trials
                        if not math.isnan(t["fid"])]
            row["fid"] = (f"{np.mean(fid_vals):.1f}±{np.std(fid_vals):.1f}"
                          if len(fid_vals) > 1
                          else (f"{fid_vals[0]:.1f}" if fid_vals else "N/A"))
            loss_vals = [t["best_loss"] for t in trials]
            row["best_loss"] = (
                f"{np.mean(loss_vals):.4f}±{np.std(loss_vals):.4f}"
                if len(loss_vals) > 1 else f"{loss_vals[0]:.4f}")
            rows.append(row)
        df = pd.DataFrame(rows)
        csv_name = f"{dataset_name}_results.csv"
        df.to_csv(csv_name, index=False)
        print(f"\n{'=' * 25} {dataset_name} results {'=' * 25}")
        print(df.to_string(index=False))
        print(f"saved to {csv_name}")

    # merge-on-write: sequential per-family runs into one artifact dir must
    # not drop prior families' timings (ref emits one JSON per full sweep)
    timing_results["total_script_time_s"] = time.time() - script_start_time
    prior_total = _load_json(f"{timing_name}_timing.json").get(
        "total_script_time_s", 0.0)
    if isinstance(prior_total, (int, float)):
        timing_results["total_script_time_s"] += prior_total
    _merge_json_write(f"{timing_name}_timing.json", timing_results)
    print(f"\ntotal script execution time: "
          f"{timing_results['total_script_time_s']:.2f}s")
