#!/usr/bin/env python
"""Export a trained checkpoint to a StableHLO serving bundle.

The reference has no deployment path (research scripts only); this CLI
turns any runner checkpoint (``--keep_ckpts``) into a self-describing
serving directory — ``manifest.json`` + ``params.npz`` + three
StableHLO functions (encode_mu / encode_z / decode) with a symbolic
batch dimension — executable by any PJRT stack without the Python
model code.  See ``cliffordtpu/serving.py``.

Example:
    python scripts/export_model.py \
        --ckpt results/fashionmnist-clifford-d16-l1 --arch vit \
        --distribution clifford --latent_dim 16 --img_size 32 \
        --outdir serving/fashion_vit_d16
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True,
                   help="checkpoint dir (contains best_model.ckpt)")
    p.add_argument("--arch", required=True,
                   choices=["mlp", "cnn", "vit", "hybrid"])
    p.add_argument("--distribution", required=True)
    p.add_argument("--latent_dim", type=int, required=True)
    p.add_argument("--img_size", type=int, default=32)
    p.add_argument("--in_channels", type=int, default=1)
    p.add_argument("--l2_normalize", action="store_true")
    p.add_argument("--scan_layers", action="store_true",
                   help="checkpoint was trained with layer-stacked scan "
                        "ViT weights")
    p.add_argument("--fused_proj", action="store_true",
                   help="export with fused wqkv/w13 ViT projections "
                        "(either layout's checkpoint loads)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--data_parallel", type=int, default=None,
                   help="export for an N-chip slice: batch sharded over a "
                        "1-D data mesh, params replicated (requires >= N "
                        "devices at export and serve time; batch must be "
                        "a multiple of N)")
    p.add_argument("--params_dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="storage format of params.npz (bfloat16 halves, "
                        "int8 quarters the artifact; weight-only, graphs "
                        "unchanged, dequantized at load)")
    p.add_argument("--native", action="store_true",
                   help="also write fixed-batch single-platform StableHLO "
                        "modules + compile_options.pb for the C++ PJRT "
                        "serving host (cliffordtpu/native/pjrt_serve.cc)")
    p.add_argument("--native_batch", type=int, default=8)
    p.add_argument("--outdir", required=True)
    args = p.parse_args()
    if args.fused_proj and args.arch != "vit":
        p.error("--fused_proj only applies to --arch vit")

    from eval_checkpoint import build_model

    from cliffordtpu.serving import export_serving
    from cliffordtpu.train.checkpoint import load_checkpoint, model_n_heads

    model = build_model(args.arch, args.distribution, args.latent_dim,
                        args.in_channels, args.img_size, args.l2_normalize,
                        scan_layers=args.scan_layers,
                        fused_proj=args.fused_proj)
    ckpt = load_checkpoint(args.ckpt, n_heads=model_n_heads(model),
                           fused_proj=args.fused_proj
                           if args.arch == "vit" else None)
    if ckpt is None:
        print(f"error: no checkpoint in {args.ckpt}", file=sys.stderr)
        return 2

    img_shape = (args.img_size, args.img_size, args.in_channels)
    res = export_serving(model, ckpt["params"], img_shape,
                         out_dir=args.outdir,
                         platforms=tuple(args.platforms.split(",")),
                         data_parallel=args.data_parallel,
                         params_dtype=args.params_dtype,
                         native=args.native,
                         native_platforms=tuple(args.platforms.split(",")),
                         native_batch=args.native_batch)
    mani = res["manifest"]
    print(json.dumps({
        "outdir": args.outdir,
        "model_class": mani["model_class"],
        "distribution": mani["distribution"],
        "flat_z_dim": mani["flat_z_dim"],
        "platforms": mani["platforms"],
        "batch": {k: v["batch"] for k, v in mani["functions"].items()},
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
