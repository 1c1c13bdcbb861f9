"""Benchmark harness: train-step throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/s", "vs_baseline": N}

Configs (``--config``; default matches the driver contract):
* ``flagship32`` — CliffordARVAE 32 px default config, clifford latent,
  batch 64: the hot path of ``cnn/fashion_train.py --arch vit``.
* ``flagship256`` — the ~75M-param 256 px CliffordAR preset
  (``cnn/cliffordar_model.py:321-340``), batch 8.
* ``cnn4096`` — CNNVAE at latent 4096 (largest ``fashion_train.py`` sweep
  point), where the clifford torus matmul is 4095x8192.

``--batch`` overrides the batch size (metric name reflects it); ``--batch_sweep``
measures 64/128/256/512 at the chosen config and writes
``artifacts/bench_batch_scaling.json`` (stdout still carries one JSON line,
for the default batch).

Baselines: the PyTorch reference model doing the same step on CPU, measured
once per config and cached in ``bench_baseline.json``
(``--remeasure-baseline``).  North-star target >= 5x (BASELINE.json).

All diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

WARMUP_STEPS = 3
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
_PROFILE_DIR = None

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "flagship32": dict(model="vit", img=32, latent=16, in_ch=1, batch=64,
                       measure_steps=30, n_windows=3),
    "flagship256": dict(model="vit", img=256, latent=16, in_ch=3, batch=8,
                        measure_steps=10, n_windows=3),
    "cnn4096": dict(model="cnn", img=32, latent=4096, in_ch=1, batch=64,
                    measure_steps=30, n_windows=3),
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def probe_backend(timeout_s: float = 240.0):
    """Live backend check with a deadline (cliffordtpu.utils.devprobe).

    When the axon tunnel is unreachable, ``jax.devices()`` can HANG in
    backend init rather than raise (observed >9 min); without this probe
    the bench would produce NO output until an external timeout kills it.
    Returns a device count (int) or an error string.
    """
    from cliffordtpu.utils.devprobe import probe_live_devices

    count, err = probe_live_devices(timeout_s)
    return count if err is None else err


def metric_name(cfg_name: str, cfg: dict, batch: int) -> str:
    if cfg_name == "flagship32" and batch == 64:
        return "cliffordar_vae_train_steps_per_sec_b64_32px"  # driver contract
    prefix = ("cliffordar_vae" if cfg["model"] == "vit"
              else f"cnnvae{cfg['latent']}")
    return f"{prefix}_train_steps_per_sec_b{batch}_{cfg['img']}px"


def build_jax_model(cfg: dict, dtype: str, scan_layers: bool = False,
                    fused_proj: bool = False):
    import jax.numpy as jnp

    from cliffordtpu.nn import CliffordARVAE, CNNVAE

    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if cfg["model"] == "vit":
        return CliffordARVAE(
            latent_dim=cfg["latent"], image_size=cfg["img"],
            in_channels=cfg["in_ch"], distribution="clifford", dtype=jdt,
            scan_layers=scan_layers, fused_proj=fused_proj)
    return CNNVAE(
        latent_dim=cfg["latent"], in_channels=cfg["in_ch"],
        distribution="clifford", img_size=cfg["img"], dtype=jdt)


def _program_flops(compiled) -> float:
    """Per-execution FLOP count from XLA's post-optimization cost
    analysis (None when the backend doesn't expose it)."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")
        return None


def measure_jax(cfg: dict, batch: int, dtype: str = "bfloat16",
                opt: str = "adamw", mesh_spec: str = None,
                xla_opts: dict = None, scan_layers: bool = False,
                fused_proj: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from cliffordtpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from cliffordtpu.train.loop import make_cnn_train_step
    from cliffordtpu.train.state import create_train_state

    log(f"jax devices: {jax.devices()}, compute dtype: {dtype}, "
        f"config: {cfg}, batch {batch}")
    model = build_jax_model(cfg, dtype, scan_layers, fused_proj)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        key, (batch, cfg["img"], cfg["img"], cfg["in_ch"])) * 2.0 - 1.0
    t0 = time.time()
    state = create_train_state(key, model, x[:2], optimizer=opt, lr=1e-4)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    log(f"params: {n_params / 1e6:.1f}M")
    n_devices = 1
    if mesh_spec:
        from cliffordtpu.parallel.mesh import (
            create_mesh,
            data_sharding,
            parse_mesh_spec,
        )
        from cliffordtpu.parallel.sharding import (
            make_sharded_cnn_train_step,
            shard_state,
        )

        mesh = create_mesh(parse_mesh_spec(mesh_spec))
        n_devices = mesh.devices.size
        log(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
        state = shard_state(mesh, state)
        x = jax.device_put(x, data_sharding(mesh, 4))
        step = make_sharded_cnn_train_step(model, mesh)
    else:
        step = make_cnn_train_step(model)
    beta = jnp.float32(1.0)
    # AOT: one explicit lower+compile, reused for warmup and measurement,
    # and the source of the XLA FLOP count for the MFU fields.
    # --xla_opts forwards TPU compiler options per-compile (the axon
    # client rejects TPU flags in XLA_FLAGS; compiler_options reach the
    # remote compiler)
    compiled = step.lower(state, x, key, beta).compile(
        compiler_options=xla_opts or None)
    flops = _program_flops(compiled)
    step = compiled
    for i in range(WARMUP_STEPS):
        state, losses = step(state, x, jax.random.fold_in(key, i), beta)
    jax.block_until_ready(losses["total_loss"])
    compile_s = time.time() - t0
    log(f"compile+warmup: {compile_s:.1f}s, "
        f"loss {float(losses['total_loss']):.3f}"
        + (f", {flops / 1e9:.1f} GFLOP/step" if flops else ""))

    import contextlib

    prof = (jax.profiler.trace(_PROFILE_DIR) if _PROFILE_DIR
            else contextlib.nullcontext())
    # The axon relay adds per-dispatch latency that varies with tunnel load
    # (measured 2.5-22 ms/step for the same program); take the best of
    # several windows as the device-throughput estimate.
    best = 0.0
    n_steps = cfg["measure_steps"]
    with prof:
        for w in range(cfg["n_windows"]):
            t0 = time.time()
            for i in range(n_steps):
                state, losses = step(
                    state, x, jax.random.fold_in(key, 100 + w * 1000 + i),
                    beta)
            jax.block_until_ready(losses["total_loss"])
            dt = time.time() - t0
            sps = n_steps / dt
            log(f"jax window {w}: {n_steps} steps in {dt:.2f}s "
                f"-> {sps:.3f} steps/s")
            best = max(best, sps)
    res = {"steps_per_sec": best, "compile_warmup_s": compile_s,
           "params_m": n_params / 1e6}
    if flops:
        # v5e bf16 peak: 197 TFLOP/s per chip
        res["flops_per_step"] = flops
        res["tflops_achieved"] = flops * best / 1e12
        if dtype == "bfloat16":
            res["mfu_bf16"] = res["tflops_achieved"] / (197.0 * n_devices)
    return res


def measure_torch_baseline(cfg: dict, batch: int, n_steps: int = 3) -> float:
    """Reference train step on CPU (same config/batch).  Models:
    ``cnn/cliffordar_model.py`` CliffordARVAE / ``cnn/models.py`` VAE."""
    import torch

    sys.path.insert(0, "/root/reference")
    torch.manual_seed(0)
    if cfg["model"] == "vit":
        from cnn.cliffordar_model import CliffordARVAE as TorchVAE

        model = TorchVAE(
            latent_dim=cfg["latent"], image_size=cfg["img"],
            in_channels=cfg["in_ch"], distribution="clifford", device="cpu")
    else:
        from cnn.models import VAE as TorchCNN

        model = TorchCNN(
            latent_dim=cfg["latent"], in_channels=cfg["in_ch"],
            distribution="clifford", device="cpu")
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    x = torch.rand(batch, cfg["in_ch"], cfg["img"], cfg["img"]) * 2 - 1
    # one warmup step
    t_all = []
    for i in range(n_steps + 1):
        t0 = time.time()
        opt.zero_grad()
        x_recon, q_z, p_z, _ = model(x)
        losses = model.compute_loss(x, x_recon, q_z, p_z, beta=1.0)
        losses["total_loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        opt.step()
        if i > 0:
            t_all.append(time.time() - t0)
        log(f"torch step {i}: {time.time() - t0:.1f}s")
    sps = 1.0 / (sum(t_all) / len(t_all))
    return sps


def get_baseline(cfg_name: str, cfg: dict, batch: int,
                 remeasure: bool = False):
    data = {}
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            data = json.load(f)
        if "torch_cpu_steps_per_sec" in data:  # legacy single-config format
            data = {"flagship32": data}
    entry = data.get(cfg_name)
    if (not remeasure and entry and entry.get("batch") == batch
            and entry.get("img") == cfg["img"]):
        return entry["torch_cpu_steps_per_sec"]
    log(f"measuring torch CPU baseline for {cfg_name} ...")
    sps = measure_torch_baseline(cfg, batch,
                                 n_steps=1 if cfg["img"] >= 256 else 3)
    data[cfg_name] = {
        "torch_cpu_steps_per_sec": sps,
        "batch": batch,
        "img": cfg["img"],
        "latent": cfg["latent"],
        "model": ("cnn/cliffordar_model.py CliffordARVAE"
                  if cfg["model"] == "vit" else "cnn/models.py VAE"),
        "hardware": "1-core CPU (reference runs on CPU per BASELINE.md)",
    }
    with open(BASELINE_FILE, "w") as f:
        json.dump(data, f, indent=2)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="flagship32", choices=sorted(CONFIGS))
    ap.add_argument("--batch", type=int, default=None,
                    help="override the config's batch size")
    ap.add_argument("--batch_sweep", action="store_true",
                    help="measure batches 64..512 at this config; results "
                         "to artifacts/bench_batch_scaling.json")
    ap.add_argument("--remeasure-baseline", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--opt", default="adamw",
                    choices=["adamw", "adamw_fused"],
                    help="adamw_fused = flat-vector AdamW+clip, numerically "
                         "equal to the optax chain (tests/test_train.py); "
                         "measured SLOWER on v5e at flagship32 (42 vs 51 "
                         "steps/s: the ravel/unravel passes cost more than "
                         "the per-leaf chain), kept for larger models")
    ap.add_argument("--profile", type=str, default=None, metavar="LOGDIR",
                    help="capture a jax.profiler trace of the measured steps")
    ap.add_argument("--mesh", type=str, default=None,
                    help="measure the pjit-sharded train step on a "
                         "('data','model') mesh: 'dp', 'N', or 'NxM' "
                         "(same step the runners use under --mesh)")
    ap.add_argument("--scan_layers", action="store_true",
                    help="layer-stacked lax.scan ViT blocks instead of "
                         "unrolled (identical math; compile-time lever)")
    ap.add_argument("--fused_proj", action="store_true",
                    help="fused wqkv / w13 ViT projections (identical math, "
                         "~40%% fewer MXU kernel launches per transformer "
                         "block; targets the dot_general-launch-bound "
                         "flagship decoder, BASELINE.md round-2 profile)")
    ap.add_argument("--rng", choices=["threefry", "rbg"], default="threefry",
                    help="PRNG implementation: threefry (jax default, "
                         "counter-based in u32 VPU ops) or rbg (hardware "
                         "bit generator — same distributions, different "
                         "stream; profiled win where per-element sampling "
                         "dominates, e.g. cnn4096's d=4096 reparam)")
    ap.add_argument("--sampler",
                    choices=["keyed", "pallas_rng", "pallas_keyed"],
                    default="keyed",
                    help="clifford circle sampler: keyed (jax.random "
                         "threefry stream, the default everywhere), "
                         "pallas_rng (fused sample+embed kernel on the TPU "
                         "hardware PRNG — same formula/epsilons, different "
                         "stream), or pallas_keyed (fused kernel with "
                         "in-kernel threefry on jax.random's counters — "
                         "SAME stream; targets the d>=2048 reparam floor, "
                         "see kernels/sampler_pallas.py)")
    ap.add_argument("--attention", choices=["xla", "pallas"], default="xla",
                    help="ViT attention path: xla (apply_rotary_half + "
                         "jax.nn.dot_product_attention, the default) or "
                         "pallas (fused RoPE+qk^T+softmax+pv, one launch "
                         "per direction — targets the dot_general-launch-"
                         "bound flagship decoder, see "
                         "kernels/attention_pallas.py)")
    ap.add_argument("--xla_opts", type=str, default=None,
                    help="comma-separated k=v TPU compiler options passed "
                         "per-compile (XLA_FLAGS can't carry TPU flags "
                         "through the axon client), e.g. "
                         "xla_tpu_enable_latency_hiding_scheduler=true")
    args = ap.parse_args()
    xla_opts = None
    if args.xla_opts:
        xla_opts = dict(kv.split("=", 1) for kv in args.xla_opts.split(","))
        log(f"compiler options: {xla_opts}")
    if args.sampler != "keyed":
        os.environ["CLIFFORDTPU_SAMPLER"] = args.sampler
        log(f"sampler: {args.sampler}")
    if args.attention != "xla":
        os.environ["CLIFFORDTPU_ATTENTION"] = args.attention
        log(f"attention: {args.attention}")
    if args.rng != "threefry":
        import jax

        jax.config.update("jax_default_prng_impl", args.rng)
        log(f"prng impl: {args.rng}")
    if args.profile:
        global _PROFILE_DIR
        _PROFILE_DIR = args.profile

    cfg = dict(CONFIGS[args.config])
    batch = args.batch or cfg["batch"]

    # One TPU client process at a time: concurrent axon sessions get
    # revoked, and a second trainer on the chip silently contaminates
    # paired-A/B timings (ROADMAP round-4 s5/s6).  Bounded wait so the
    # one-JSON-line contract holds even against a wedged holder.
    from cliffordtpu.utils.tpu_lock import TpuLockError, hold_tpu_lock

    try:
        _tpu_lock = hold_tpu_lock(
            label=f"bench:{args.config}",
            timeout_s=float(os.environ.get("CLIFFORDTPU_TPU_LOCK_TIMEOUT",
                                           "900")))
    except TpuLockError as e:
        print(json.dumps({
            "metric": metric_name(args.config, cfg, batch),
            "value": 0.0, "unit": "steps/s", "vs_baseline": None,
            "error": str(e),
        }))
        sys.exit(3)

    # Bounded probe-retry window: the axon tunnel flaps (multi-hour
    # outages observed), and a one-shot probe at the wrong moment turns a
    # whole bench round into an error line.  A hung first probe does not
    # poison later ones — they block on the same backend-init lock and
    # all complete if the tunnel recovers mid-window.  Worst case
    # (retries=3): ~16 min of retrying, then the error JSON — comparable
    # to a cold-compile run, so external timeouts sized for compiles
    # still see output.
    retries = int(os.environ.get("CLIFFORDTPU_BENCH_PROBE_RETRIES", "3"))
    probed = None
    for attempt in range(max(1, retries)):
        if attempt:
            log(f"backend probe retry {attempt + 1}/{retries} in 120 s")
            time.sleep(120)
        probed = probe_backend()
        if isinstance(probed, int):
            break
        log(f"backend probe failed: {probed}")
    if not isinstance(probed, int):
        # fail with a well-formed JSON line instead of hanging in
        # backend init until an external timeout produces nothing
        print(json.dumps({
            "metric": metric_name(args.config, cfg, batch),
            "value": 0.0, "unit": "steps/s", "vs_baseline": None,
            "error": str(probed),
        }))
        sys.exit(3)

    if args.batch_sweep:
        sweep = {}
        for b in (64, 128, 256, 512):
            res = measure_jax(cfg, b, args.dtype, args.opt, args.mesh, xla_opts, args.scan_layers, args.fused_proj)
            sweep[str(b)] = {**res,
                             "steps_per_sec": round(res["steps_per_sec"], 3),
                             "images_per_sec": round(
                                 res["steps_per_sec"] * b, 1)}
            log(f"batch {b}: {res['steps_per_sec']:.2f} steps/s = "
                f"{res['steps_per_sec'] * b:.0f} img/s")
        os.makedirs("artifacts", exist_ok=True)
        out_path = os.path.join("artifacts", "bench_batch_scaling.json")
        with open(out_path, "w") as f:
            json.dump({"config": args.config, "dtype": args.dtype,
                       "sweep": sweep}, f, indent=2)
        log(f"wrote {out_path}")
        jax_res = sweep[str(batch)] if str(batch) in sweep \
            else measure_jax(cfg, batch, args.dtype, args.opt, args.mesh, xla_opts, args.scan_layers, args.fused_proj)
    else:
        jax_res = measure_jax(cfg, batch, args.dtype, args.opt, args.mesh, xla_opts, args.scan_layers, args.fused_proj)
    jax_sps = jax_res["steps_per_sec"]

    if args.skip_baseline:
        baseline = None
    else:
        try:
            baseline = get_baseline(args.config, cfg, batch,
                                    args.remeasure_baseline)
        except Exception as e:  # torch baseline is best-effort
            log(f"baseline measurement failed: {e}")
            baseline = None

    out = {
        "metric": metric_name(args.config, cfg, batch),
        "value": round(jax_sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(jax_sps / baseline, 2) if baseline else None,
    }
    # MFU extras (VERDICT r02 item 5): XLA-counted FLOPs so perf
    # regressions are visible across rounds without a by-hand profile
    if jax_res.get("flops_per_step"):
        out["flops_per_step"] = round(jax_res["flops_per_step"])
        out["tflops_achieved"] = round(jax_res["tflops_achieved"], 2)
        if "mfu_bf16" in jax_res:
            out["mfu_bf16"] = round(jax_res["mfu_bf16"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
