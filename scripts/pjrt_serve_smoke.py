"""On-chip smoke for the C++ PJRT serving host (pjrt_serve).

Exports a small CNN bundle with native TPU artifacts, then runs the C++
host against the axon PJRT plugin (the same .so the jax session uses)
and checks decode() output against the CPU in-process reference.

RUN STRICTLY SOLO: the host process IS a TPU process — per CLAUDE.md a
second process touching the axon backend wedges the first, so make sure
no other TPU job (bench, runner, chain stage) is active.  This wrapper
itself is pinned to CPU; only the spawned host binary touches the TPU.

    python scripts/pjrt_serve_smoke.py [--plugin /opt/axon/libaxon_pjrt.so]
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import uuid

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(__file__))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    p.add_argument("--topology", default="v5e:1x1x1")
    p.add_argument("--bench", type=int, default=20)
    p.add_argument("--outdir", default=None,
                   help="bundle dir (default: fresh temp dir)")
    args = p.parse_args()

    from eval_checkpoint import build_model

    from cliffordtpu.native.build import build
    from cliffordtpu.serving import export_serving, serving_fns
    from cliffordtpu.train.state import create_train_state

    host = build("pjrt_serve")
    if host is None:
        print("SMOKE SKIP: pjrt_serve did not build", file=sys.stderr)
        return 3

    outdir = args.outdir or tempfile.mkdtemp(prefix="pjrt_smoke_")
    model = build_model("cnn", "clifford", 64, 1, 32, False)
    state = create_train_state(jax.random.PRNGKey(0), model,
                               jnp.zeros((2, 32, 32, 1)))
    # Export under HIGHEST matmul precision: a default-precision bundle
    # runs f32 matmuls/convs as bf16 passes on TPU, which forced the
    # smoke tolerance out to 2e-2 — wide enough to hide genuine
    # mid-scale corruption (a subtly wrong weight tensor lands in the
    # 1e-3..1e-2 band).  With the precision pinned into the StableHLO
    # the TPU executes true f32 and the per-element bound stays tight.
    with jax.default_matmul_precision("highest"):
        export_serving(model, state.params, (32, 32, 1), out_dir=outdir,
                       platforms=("cpu", "tpu"), native=True,
                       native_platforms=("cpu", "tpu"), native_batch=8)
    man = json.load(open(os.path.join(outdir, "manifest.json")))
    zdim = int(man["native"]["functions"]["decode"]["args"][0]["shape"][1])
    z = np.random.default_rng(0).normal(size=(8, zdim)).astype(np.float32)
    zin = os.path.join(outdir, "z.npy")
    zout = os.path.join(outdir, "y.npy")
    np.save(zin, z)

    fns = serving_fns(model, (32, 32, 1))
    with jax.default_matmul_precision("highest"):
        want = np.asarray(fns["decode"](jax.device_get(state.params), z))

    cmd = [host, "--plugin", args.plugin, "--bundle", outdir,
           "--fn", "decode", "--platform", "tpu",
           "--input", zin, "--output", zout, "--verbose",
           "--bench", str(args.bench),
           "--create", "remote_compile=1", "--create", "local_only=0",
           "--create", "priority=0", "--create", f"topology={args.topology}",
           "--create", "n_slices=1",
           "--create", f"session_id={uuid.uuid4()}",
           "--create", "rank=4294967295"]
    print("running:", " ".join(cmd), file=sys.stderr)
    # fresh env WITHOUT the jax/axon python plumbing; the host only dlopens
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=1800)
    sys.stderr.write(proc.stderr)
    print(proc.stdout.strip())
    if proc.returncode != 0:
        print(f"SMOKE FAIL rc={proc.returncode}", file=sys.stderr)
        return 1
    got = np.load(zout)
    if got.shape != want.shape:
        print(json.dumps({"smoke": "pjrt_serve_tpu", "ok": False,
                          "error": f"shape {got.shape} != {want.shape}"}))
        return 1
    err = float(np.max(np.abs(got - want)))
    # The bundle's stablehlo now pins HIGHEST matmul precision (see the
    # export above), so the TPU runs true-f32 matmuls/convs and the
    # CPU-vs-TPU delta on this tanh-bounded decoder is ordinary f32
    # reassociation noise — a tight bound that a subtly-wrong weight
    # tensor (round-4 measured those landing at O(1e-3..1e-2) under the
    # old default-precision 2e-2 bound) cannot slip under.
    ok = err < 5e-4
    print(json.dumps({"smoke": "pjrt_serve_tpu", "ok": ok,
                      "max_abs_err_vs_cpu": err, "bundle": outdir}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
