"""TPU-native serving/export path: ``jax.export`` -> StableHLO artifacts.

The reference is research scripts only — it has no deployment story (models
live and die inside the runner process; the closest thing is the torch
``state_dict`` checkpoint reloaded by ``scripts/paper_bind_bundle_figure.py:40-143``).
For production serving the idiomatic TPU path is ahead-of-time export:
every model family's three inference entry points are lowered to
**StableHLO** with a symbolic batch dimension and serialized, so a PJRT
serving stack (C++ or a later jax) can execute them without the Python
model code.

Artifacts (one directory per model):

```
manifest.json        # shapes/dtypes/layouts, calling convention, versions
params.npz           # weights, flat "a/b/c" keys (hot-swappable)
encode_mu.stablehlo  # x[b,H,W,C]f32            -> mu[b,F_mu]
encode_z.stablehlo   # key[2]u32, x[b,H,W,C]f32 -> z[b,F_z]   (sampled)
decode.stablehlo     # z[b,F_z]f32              -> y[b,...]   (images/logits)
```

Weights are passed as an argument pytree (NOT baked into the module), so
the same artifact serves updated checkpoints and the serialized modules
stay small.  The batch dimension is exported symbolically where the
program allows it; functions whose lowering rejects shape polymorphism
(e.g. some RNG-bearing paths) fall back to a fixed batch recorded in the
manifest.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

SERVING_FORMAT_VERSION = 1
_MANIFEST = "manifest.json"
_PARAMS = "params.npz"
_FN_NAMES = ("encode_mu", "encode_z", "decode")


# ---- param (de)serialization: nested dict <-> flat npz ----


def _flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten_params(tree[k], f"{prefix}{k}/"))
        return out
    out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for key, val in flat.items():
        node = root
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return root


# ---- optional storage quantization of params.npz ----
#
# Purely a STORAGE format: the exported graphs keep their float32 param
# inputs; quantized weights are dequantized at load time.  "bfloat16"
# halves the artifact (stored as the raw uint16 view — npz has no bf16),
# "int8" quarters it with one scale per output column (last axis),
# weight-only symmetric quantization.

_QUANT_MODES = ("float32", "bfloat16", "int8")


def _quantize_flat(flat: Dict[str, np.ndarray], mode: str):
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        v = np.asarray(v)
        if mode == "float32" or not np.issubdtype(v.dtype, np.floating):
            out[k] = v
        elif mode == "bfloat16":
            import jax.numpy as _jnp

            bf = np.asarray(_jnp.asarray(v, _jnp.bfloat16))
            out[k + "::bf16"] = bf.view(np.uint16)
        elif v.ndim < 2:
            out[k] = v  # biases/scalars: negligible size, keep exact
        else:  # int8, symmetric, one scale per output column (last axis)
            scale = (np.max(np.abs(v), axis=tuple(range(v.ndim - 1)),
                            keepdims=True) / 127.0)
            scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
            q = np.clip(np.round(v / scale), -127, 127).astype(np.int8)
            out[k + "::int8"] = q
            out[k + "::scale"] = scale
    return out


def _dequantize_flat(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        if k.endswith("::scale"):
            continue
        if k.endswith("::bf16"):
            import jax.numpy as _jnp

            out[k[:-6]] = np.asarray(
                _jnp.asarray(v.view(_jnp.bfloat16), _jnp.float32))
        elif k.endswith("::int8"):
            scale = flat[k[:-6] + "::scale"]
            out[k[:-6]] = (v.astype(np.float32) * scale).astype(np.float32)
        else:
            out[k] = v
    return out


# ---- the three serving entry points, model-family agnostic ----


def serving_fns(model: Any, img_shape) -> Dict[str, Callable]:
    """Pure functions ``(params, ...) -> array`` for any model family.

    Uses the same duck-typed surface as ``eval.adapters.ModelHandle``
    (mirroring the reference's ``utils/wandb_utils.py:16-42`` adapters):
    MLPVAE exposes ``encode``; CNN/ViT/Hybrid expose ``encode_heads``.
    """
    is_mlp = not hasattr(model, "encode_heads")

    def encode_mu(params, x):
        if is_mlp:
            mu, _ = model.apply({"params": params},
                                x.reshape(x.shape[0], -1),
                                method=model.encode)
        else:
            mu, _ = model.apply({"params": params}, x,
                                method=model.encode_heads)
        if mu.ndim == 3:
            mu = mu.reshape(mu.shape[0], -1)
        return mu

    def encode_z(params, key, x):
        return model.apply({"params": params}, x, rngs={"sample": key},
                           method=model.get_flat_latent)

    def decode(params, z):
        return model.apply({"params": params}, z, method=model.decode)

    return {"encode_mu": encode_mu, "encode_z": encode_z, "decode": decode}


# ---- export ----


def _spec(shape, dtype) -> jax.ShapeDtypeStruct:
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def _sd_json(sd) -> dict:
    return {"shape": [str(d) for d in sd.shape], "dtype": str(sd.dtype)}


def _strip_debug_locs(txt: str) -> str:
    """Re-print an MLIR module with debug locations dropped.

    jax's ``deserialize_portable_artifact`` prints the module WITH full
    debug info — ``#loc`` lines recording the python call stack of the
    exporting process (absolute paths, pytest frames, caller depth), so
    the artifact bytes vary with who called export.  MLIR's asm printer
    omits locations unless asked for them, so a parse + re-print is the
    supported way to get canonical, location-free text.
    """
    from jax._src.interpreters import mlir as _mlir
    from jax._src.lib.mlir import ir as _ir

    with _mlir.make_ir_context():
        return _ir.Module.parse(txt).operation.get_asm(
            enable_debug_info=False)


def export_serving(model: Any, params: Any, img_shape,
                   out_dir: Optional[str] = None,
                   platforms=("cpu", "tpu"),
                   fallback_batch: int = 8,
                   data_parallel: Optional[int] = None,
                   params_dtype: str = "float32",
                   native: bool = False,
                   native_platforms=("cpu", "tpu"),
                   native_batch: int = 8) -> dict:
    """Export a trained model's serving functions to StableHLO.

    ``img_shape``: (H, W, C) of the input images.  Returns the manifest
    dict; when ``out_dir`` is given the artifacts are written there.

    ``data_parallel``: export for an N-chip slice — the batch axis is
    sharded over a 1-D ("data",) mesh (params replicated) and the
    artifact records the device count; GSPMD handles placement, there
    are no hand-written collectives.  Requires >= N devices at export
    AND serve time.  The symbolic batch becomes ``N*b`` (any multiple
    of the mesh size).

    ``params_dtype``: storage format of ``params.npz`` — "float32"
    (exact), "bfloat16" (half size) or "int8" (quarter size, weight-only
    symmetric per-output-column).  The exported graphs are unchanged
    (float32 inputs); quantized weights dequantize at load time.

    ``native=True`` additionally writes artifacts for the C++ PJRT
    serving host (``cliffordtpu/native/pjrt_serve.cc``): per function
    and platform a SINGLE-platform, FIXED-batch plain-StableHLO module
    (``<fn>.native.<platform>.stablehlo`` — static shapes and no
    platform-index argument, so any PJRT plugin compiles it directly,
    unlike the symbolic-batch multi-platform modules above, which need
    ``jax.export``'s refinement machinery), a serialized
    ``compile_options.pb``, and a ``native`` manifest section recording
    the flat calling convention: param leaves (in ``param_order``,
    matching the ``params.npz`` keys) followed by the array arguments.
    Native export is single-device (incompatible with
    ``data_parallel``).
    """
    if params_dtype not in _QUANT_MODES:
        raise ValueError(f"params_dtype must be one of {_QUANT_MODES}")
    from jax import export as jexport

    fns = serving_fns(model, img_shape)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # probe the flat latent / output shapes abstractly (no compute)
    x1 = _spec((1, *img_shape), jnp.float32)
    key_sd = _spec((2,), jnp.uint32)
    z1 = jax.eval_shape(fns["encode_z"], params, key_sd, x1)
    y1 = jax.eval_shape(fns["decode"], params, z1)
    mu1 = jax.eval_shape(fns["encode_mu"], params, x1)

    dp = int(data_parallel or 1)
    if dp > 1:
        from cliffordtpu.parallel.mesh import create_mesh

        mesh = create_mesh((dp, 1), devices=jax.devices()[:dp])
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        row = NamedSharding(mesh, P("data"))
        (b,) = jexport.symbolic_shape("b")
        b = dp * b  # batch = any multiple of the mesh size
    else:
        mesh = None
        (b,) = jexport.symbolic_shape("b")

    def specs_for(name, batch):
        x_s = _spec((batch, *img_shape), jnp.float32)
        z_s = _spec((batch, z1.shape[-1]), z1.dtype)
        if name == "encode_mu":
            return (params, x_s)
        if name == "encode_z":
            return (params, key_sd, x_s)
        return (params, z_s)

    def jit_for(name, fn):
        if mesh is None:
            return jax.jit(fn)
        # params replicated; the key (rank 1) replicated; batch args
        # and outputs sharded on axis 0 over "data"
        if name == "encode_mu":
            in_sh = (rep, row)
        elif name == "encode_z":
            in_sh = (rep, rep, row)
        else:
            in_sh = (rep, row)
        return jax.jit(fn, in_shardings=in_sh, out_shardings=row)

    exported, batch_mode = {}, {}
    for name, fn in fns.items():
        jitted = jit_for(name, fn)
        try:
            exported[name] = jexport.export(
                jitted, platforms=list(platforms))(*specs_for(name, b))
            batch_mode[name] = "symbolic"
        except Exception as e:
            # some lowerings reject shape polymorphism (commonly RNG
            # paths), and the rejection WORDING varies across jax
            # versions — so never gate on message substrings: retry with
            # a pinned batch on ANY symbolic-export failure, loudly.  A
            # genuine export failure (bad params tree, lowering bug)
            # fails identically with the pinned batch, in which case the
            # ORIGINAL symbolic-batch error is re-raised (pinned error
            # chained as its cause) instead of being masked.
            fixed = max(fallback_batch, dp)
            fixed -= fixed % dp
            import sys

            print(f"serving export: symbolic batch failed for {name!r} "
                  f"({type(e).__name__}: {e}); retrying with fixed "
                  f"batch {fixed}", file=sys.stderr)
            try:
                exported[name] = jexport.export(
                    jitted, platforms=list(platforms))(
                        *specs_for(name, fixed))
            except Exception as pinned_err:
                raise e from pinned_err
            batch_mode[name] = fixed

    def batch_dim(name):
        return b if batch_mode[name] == "symbolic" else batch_mode[name]

    manifest = {
        "format_version": SERVING_FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "data_parallel": dp,
        "model_class": type(model).__name__,
        "distribution": getattr(model, "distribution", "normal"),
        "latent_dim": int(getattr(model, "latent_dim",
                                  getattr(model, "z_dim", 0))),
        "img_shape": [int(d) for d in img_shape],
        "flat_z_dim": int(z1.shape[-1]),
        "mu_dim": int(mu1.shape[-1]),
        "decode_output": ("sigmoid_logits"
                          if not hasattr(model, "encode_heads")
                          else "tanh_image"),
        # calling convention: params pytree is always the FIRST argument;
        # "in" lists the remaining (array) arguments.  Shapes reflect the
        # actually-exported batch (symbolic "b"/"N*b" or the pinned int)
        "functions": {
            name: {
                "batch": batch_mode[name],
                "in": [_sd_json(s)
                       for s in specs_for(name, batch_dim(name))[1:]],
                "out": _sd_json(jax.eval_shape(
                    fns[name], *specs_for(name, batch_dim(name)))),
            }
            for name in _FN_NAMES
        },
    }

    manifest["params_dtype"] = params_dtype

    native_files: Dict[str, bytes] = {}
    if native:
        if dp > 1:
            raise ValueError("native export is single-device; it is "
                             "incompatible with data_parallel > 1")
        from jax._src.lib import xla_client as _xc

        nb = int(native_batch)
        # flat param-leaf names in jax tree_flatten order == the sorted
        # per-level traversal used for the params.npz keys
        paths = jax.tree_util.tree_flatten_with_path(params)[0]
        param_order = ["/".join(str(k.key) for k in p) for p, _ in paths]
        nfns = {}
        for name, fn in fns.items():
            modules, kept = {}, None
            for plat in native_platforms:
                exp_n = jexport.export(jax.jit(fn), platforms=[plat])(
                    *specs_for(name, nb))
                # portable (vhlo) artifact -> plain StableHLO text, which
                # every PJRT plugin's "mlir" program format accepts
                txt = _xc._xla.mlir.deserialize_portable_artifact(
                    exp_n.mlir_module_serialized)
                # re-print without debug info: the deserialized text
                # carries #loc python-callstack locations (build-machine
                # paths, caller-stack-depth dependent), which bloat the
                # artifact and make the bytes nondeterministic across
                # call sites.  Serving artifacts must be deterministic
                # and host-path-free.
                txt = _strip_debug_locs(txt)
                fname = f"{name}.native.{plat}.stablehlo"
                modules[plat] = fname
                native_files[fname] = txt.encode()
                if kept is None:
                    kept = list(exp_n.module_kept_var_idx)
                elif kept != list(exp_n.module_kept_var_idx):
                    raise RuntimeError(
                        f"native export: platforms disagree on kept "
                        f"inputs for {name!r} ({kept} vs "
                        f"{list(exp_n.module_kept_var_idx)})")
            arg_specs = specs_for(name, nb)[1:]
            # the lowered module's operands are the KEPT flat inputs
            # (XLA drops unused param leaves): flat index < n_leaves is a
            # param leaf, the rest are the logical array arguments
            n_leaves = len(param_order)
            inputs = []
            for i in kept:
                if i < n_leaves:
                    inputs.append({"kind": "param",
                                   "name": param_order[i]})
                else:
                    inputs.append({"kind": "arg", "index": i - n_leaves,
                                   **_sd_json(arg_specs[i - n_leaves])})
            nfns[name] = {
                "args": [_sd_json(s) for s in arg_specs],
                "inputs": inputs,
                "out": _sd_json(jax.eval_shape(
                    fns[name], *specs_for(name, nb))),
                "modules": modules,
            }
        native_files["compile_options.pb"] = (
            _xc.CompileOptions().SerializeAsString())
        manifest["native"] = {
            "batch": nb,
            "platforms": list(native_platforms),
            "param_order": param_order,
            "compile_options": "compile_options.pb",
            "functions": nfns,
        }

    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        flat = _quantize_flat(_flatten_params(jax.device_get(params)),
                              params_dtype)
        np.savez(os.path.join(out_dir, _PARAMS), **flat)
        for name, exp in exported.items():
            with open(os.path.join(out_dir, f"{name}.stablehlo"), "wb") as f:
                f.write(exp.serialize())
        for fname, blob in native_files.items():
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(blob)
        with open(os.path.join(out_dir, _MANIFEST), "w") as f:
            json.dump(manifest, f, indent=2)

    return {"manifest": manifest, "exported": exported}


# ---- load + run ----


class LoadedServing:
    """Deserialized serving bundle: ``encode_mu`` / ``encode_z`` /
    ``decode`` callables backed by the exported StableHLO (no Python
    model code involved)."""

    def __init__(self, directory: str):
        from jax import export as jexport

        with open(os.path.join(directory, _MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] > SERVING_FORMAT_VERSION:
            raise ValueError(
                f"serving bundle format {self.manifest['format_version']} "
                f"is newer than supported {SERVING_FORMAT_VERSION}")
        with np.load(os.path.join(directory, _PARAMS)) as z:
            self._params = _unflatten_params(
                _dequantize_flat({k: z[k] for k in z.files}))
        self._placed_params = None  # device-put cache (hot path)
        self._exp = {}
        for name in _FN_NAMES:
            with open(os.path.join(directory, f"{name}.stablehlo"),
                      "rb") as f:
                self._exp[name] = jexport.deserialize(bytearray(f.read()))
        dp = int(self.manifest.get("data_parallel", 1))
        self._mesh = None
        if dp > 1:
            from cliffordtpu.parallel.mesh import create_mesh

            if len(jax.devices()) < dp:
                raise ValueError(
                    f"bundle was exported for {dp}-way data parallelism "
                    f"but only {len(jax.devices())} devices are visible")
            self._mesh = create_mesh((dp, 1), devices=jax.devices()[:dp])

    @property
    def params(self):
        return self._params

    @params.setter
    def params(self, new_params):
        """Hot-swap the weights (invalidates the placed-on-device cache)."""
        self._params = new_params
        self._placed_params = None

    def _place(self, arr, batch_axis: bool):
        arr = jnp.asarray(arr)
        if self._mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = (P("data", *([None] * (arr.ndim - 1)))
                if batch_axis else P())
        return jax.device_put(arr, NamedSharding(self._mesh, spec))

    def _params_placed(self):
        # transfer the weights host->device ONCE, not per request
        if self._placed_params is None:
            self._placed_params = jax.tree_util.tree_map(
                lambda a: self._place(a, batch_axis=False), self._params)
        return self._placed_params

    def encode_mu(self, x):
        return self._exp["encode_mu"].call(
            self._params_placed(),
            self._place(jnp.asarray(x, jnp.float32), True))

    def encode_z(self, key, x):
        key = jnp.asarray(key)
        if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
            key = jax.random.key_data(key)  # typed key -> raw uint32[2]
        return self._exp["encode_z"].call(
            self._params_placed(), self._place(key.astype(jnp.uint32), False),
            self._place(jnp.asarray(x, jnp.float32), True))

    def decode(self, z):
        return self._exp["decode"].call(
            self._params_placed(),
            self._place(jnp.asarray(z, jnp.float32), True))


def load_serving(directory: str) -> LoadedServing:
    return LoadedServing(directory)
