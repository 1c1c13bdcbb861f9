"""Fused ViT projection layout (``fused_proj``): the wqkv / w13 kernels
compute identical math to the split Dense q/k/v / w1/w3 layers — verified
by converting the SAME weights between layouts — and both layouts'
checkpoints interconvert exactly through ``train.checkpoint``.
"""

import copy
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cliffordtpu.nn import CliffordARVAE
from cliffordtpu.nn.param_convert import (
    detect_proj_layout,
    fuse_vit_params,
    unfuse_vit_params,
)

KEY = jax.random.PRNGKey(0)
N_HEADS = 2  # z_channels 128 -> max(1, 128 // 64)


def _model(fused: bool, scan: bool = False, dist: str = "clifford"):
    # 2 heads so the head-interleaved wqkv layout is actually exercised
    return CliffordARVAE(
        latent_dim=6, image_size=32, in_channels=1, distribution=dist,
        cnn_chs=[8, 32, 128], z_channels=128, encoder_vit_layers=2,
        decoder_vit_layers=2, patch_size=4, fused_proj=fused,
        scan_layers=scan,
    )


def _init(model, key=KEY):
    x = jax.random.uniform(key, (2, 32, 32, 1)) * 2 - 1
    return model.init({"params": key, "sample": key}, x)["params"], x


def _tree_to_np(tree):
    return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)


def test_fuse_roundtrip_exact():
    split, _ = _init(_model(fused=False))
    split = _tree_to_np(split)
    work = copy.deepcopy(split)
    n = fuse_vit_params(work, N_HEADS)
    assert n == 8  # (attn + swiglu) x 2 layers x (enc + dec)
    assert detect_proj_layout(work) == "fused"
    m = unfuse_vit_params(work, N_HEADS)
    assert m == n
    flat_a = jax.tree_util.tree_leaves_with_path(split)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(work))
    # tree_leaves_with_path gives hashable paths; compare leaf-for-leaf
    back = jax.tree_util.tree_leaves_with_path(work)
    assert len(flat_a) == len(back)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(back, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(la, lb)


def test_fused_forward_matches_split_with_same_weights():
    """Every fused output column is the same fan-in reduction as its split
    counterpart, so converting the weights gives the same model."""
    split_model = _model(fused=False)
    fused_model = _model(fused=True)
    params, x = _init(split_model)
    fused_params = _tree_to_np(params)
    fused_params = jax.tree_util.tree_map(lambda a: a.copy(), fused_params)
    fuse_vit_params(fused_params, N_HEADS)

    skey = jax.random.PRNGKey(7)
    out_s = split_model.apply({"params": params}, x, rngs={"sample": skey})
    out_f = fused_model.apply({"params": fused_params}, x,
                              rngs={"sample": skey})
    # (x_recon, q_z, p_z, z) — recon and z are the end-to-end signals
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_f[0]),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_s[3]), np.asarray(out_f[3]),
                               rtol=0, atol=1e-5)


def test_fused_grads_match_split_grads():
    split_model = _model(fused=False)
    fused_model = _model(fused=True)
    params, x = _init(split_model)
    fused_params = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(),
                                          params)
    fuse_vit_params(fused_params, N_HEADS)
    skey = jax.random.PRNGKey(3)

    def loss(model):
        def f(p):
            recon, _, _, _ = model.apply({"params": p}, x,
                                         rngs={"sample": skey})
            return jnp.mean((recon - x) ** 2)
        return f

    g_split = jax.grad(loss(split_model))(params)
    g_fused = jax.grad(loss(fused_model))(fused_params)
    # convert split grads into the fused layout: gradients rearrange with
    # the identical column permutation as the weights
    g_split_np = _tree_to_np(g_split)
    fuse_vit_params(g_split_np, N_HEADS)
    flat_a = jax.tree_util.tree_leaves_with_path(g_split_np)
    flat_b = jax.tree_util.tree_leaves_with_path(_tree_to_np(g_fused))
    assert len(flat_a) == len(flat_b)
    for (pa, la), (pb, lb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(la, lb, rtol=0, atol=2e-6)


def test_sliced_xavier_init_scale():
    """The fused kernels must be initialised like their split counterparts:
    per-slice xavier limits, not the (larger-fan-out) fused-shape limit."""
    params, _ = _init(_model(fused=True))
    enc = params["encoder_vit"]
    # find one attention + one swiglu kernel
    blk = [v for k, v in sorted(enc.items()) if k.startswith("TransformerBlock_")][0]
    wqkv = np.asarray(blk["Attention_0"]["wqkv"]["kernel"])
    w13 = np.asarray(blk["SwiGLU_0"]["w13"]["kernel"])
    D = wqkv.shape[0]
    lim_qkv = math.sqrt(6.0 / (D + D))  # split q/k/v are (D, D)
    assert np.max(np.abs(wqkv)) <= lim_qkv + 1e-7
    # a plain xavier over (D, 3D) would cap at sqrt(6/(D+3D)) — strictly
    # smaller; per-slice draws should exceed it with overwhelming prob.
    assert np.max(np.abs(wqkv)) > math.sqrt(6.0 / (D + 3 * D))
    d_ff = w13.shape[1] // 2
    lim_w13 = math.sqrt(6.0 / (D + d_ff))
    assert np.max(np.abs(w13)) <= lim_w13 + 1e-7
    assert np.max(np.abs(w13)) > math.sqrt(6.0 / (D + 2 * d_ff))


def test_checkpoint_cross_layout_load(tmp_path):
    """A checkpoint written in the split layout restores into a fused
    model (and the converted params compute the same forward)."""
    from cliffordtpu.train.checkpoint import (
        load_checkpoint,
        model_n_heads,
        save_checkpoint,
    )
    from cliffordtpu.train.state import create_train_state

    split_model = _model(fused=False)
    fused_model = _model(fused=True)
    params, x = _init(split_model)
    state = create_train_state(KEY, split_model, x, optimizer="adamw",
                               lr=1e-4)
    save_checkpoint(str(tmp_path), state, step=3, best_metric=1.5,
                    rng_key=KEY)

    payload = load_checkpoint(str(tmp_path),
                              n_heads=model_n_heads(fused_model),
                              fused_proj=True)
    assert payload["proj_layout"] == "fused"
    assert detect_proj_layout(payload["params"]) == "fused"
    skey = jax.random.PRNGKey(11)
    out_split = split_model.apply({"params": state.params}, x,
                                  rngs={"sample": skey})
    out_fused = fused_model.apply({"params": payload["params"]}, x,
                                  rngs={"sample": skey})
    np.testing.assert_allclose(np.asarray(out_split[0]),
                               np.asarray(out_fused[0]), rtol=0, atol=1e-5)

    # and back: the fused payload re-loads into the split layout
    payload2 = load_checkpoint(str(tmp_path),
                               n_heads=model_n_heads(split_model),
                               fused_proj=False)
    assert detect_proj_layout(payload2["params"]) == "split"


def test_tp_rules_shard_fused_kernels():
    from jax.sharding import PartitionSpec as P

    from cliffordtpu.parallel.mesh import create_mesh
    from cliffordtpu.parallel.sharding import infer_param_sharding

    model = _model(fused=True)
    params, _ = _init(model)
    mesh = create_mesh((4, 2))
    shardings = infer_param_sharding(mesh, params)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    specs = {
        "/".join(getattr(k, "key", str(k)) for k in path): s.spec
        for path, s in leaves
    }
    qkv = [v for k, v in specs.items() if "wqkv/kernel" in k]
    wo = [v for k, v in specs.items() if "/wo/kernel" in k]
    w13 = [v for k, v in specs.items() if "w13/kernel" in k]
    w2 = [v for k, v in specs.items() if "/w2/kernel" in k]
    assert qkv and all(s == P(None, "model") for s in qkv)
    assert wo and all(s == P("model", None) for s in wo)
    assert w13 and all(s == P(None, "model") for s in w13)
    assert w2 and all(s == P("model", None) for s in w2)


def test_fused_tp_step_matches_single_device():
    """The fused layout trains under DP x TP to the same loss as its
    single-device step — the head-grouped/pair-interleaved column orders
    exist exactly so these shards stay local."""
    from cliffordtpu.parallel.mesh import create_mesh
    from cliffordtpu.parallel.sharding import (
        make_sharded_cnn_train_step,
        shard_state,
    )
    from cliffordtpu.train.loop import make_cnn_train_step
    from cliffordtpu.train.state import create_train_state

    model = _model(fused=True)
    x = jax.random.uniform(KEY, (8, 32, 32, 1)) * 2 - 1
    state1 = create_train_state(KEY, model, x[:2], optimizer="adamw", lr=1e-4)
    state2 = create_train_state(KEY, model, x[:2], optimizer="adamw", lr=1e-4)
    skey = jax.random.PRNGKey(5)

    step1 = make_cnn_train_step(model)
    state1, losses1 = step1(state1, jnp.asarray(x), skey, 1.0)

    mesh = create_mesh((4, 2))
    state2 = shard_state(mesh, state2)
    step2 = make_sharded_cnn_train_step(model, mesh)
    state2, losses2 = step2(state2, jnp.asarray(x), skey, 1.0)
    # sharded reductions reassociate fp32 sums; compare relatively
    np.testing.assert_allclose(float(losses1["total_loss"]),
                               float(losses2["total_loss"]), rtol=1e-5)


def test_scan_layers_composes_with_fused_proj():
    model = _model(fused=True, scan=True)
    params, x = _init(model)
    out = model.apply({"params": params}, x, rngs={"sample": KEY})
    assert np.isfinite(np.asarray(out[0])).all()
    assert detect_proj_layout(params) == "fused"


def test_scan_stacked_tree_conversion():
    """fuse/unfuse also rearranges layer-stacked ``scan_layers`` trees
    (kernels carry a leading layer axis): converting a split scan tree
    gives the same forward as the fused scan model with those weights."""
    split_model = _model(fused=False, scan=True)
    fused_model = _model(fused=True, scan=True)
    params, x = _init(split_model)
    conv = jax.tree_util.tree_map(lambda a: np.asarray(a).copy(), params)
    n = fuse_vit_params(conv, N_HEADS)
    assert n == 4  # stacked attn + stacked swiglu, per (enc, dec) scan
    assert detect_proj_layout(conv) == "fused"
    # stacked kernels keep their leading layer axis
    flat = dict((jax.tree_util.keystr(p), l) for p, l in
                jax.tree_util.tree_leaves_with_path(conv))
    wqkv = [v for k, v in flat.items() if "wqkv" in k]
    assert wqkv and all(w.ndim == 3 for w in wqkv)

    skey = jax.random.PRNGKey(13)
    out_s = split_model.apply({"params": params}, x, rngs={"sample": skey})
    out_f = fused_model.apply({"params": conv}, x, rngs={"sample": skey})
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_f[0]),
                               rtol=0, atol=1e-5)
