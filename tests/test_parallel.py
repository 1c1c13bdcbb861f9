"""Multi-device tests on the virtual 8-device CPU mesh (conftest sets
xla_force_host_platform_device_count=8): DP-sharded step == single-device
step on the gathered batch, TP rules apply, dryrun entry point works."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from cliffordtpu.nn import CliffordARVAE
from cliffordtpu.parallel.mesh import create_mesh, data_sharding
from cliffordtpu.parallel.sharding import (
    infer_param_sharding,
    make_sharded_cnn_train_step,
    shard_state,
)
from cliffordtpu.train.loop import make_cnn_train_step
from cliffordtpu.train.state import create_train_state

KEY = jax.random.PRNGKey(0)


def _tiny_model(dist="clifford"):
    return CliffordARVAE(
        latent_dim=8, image_size=32, in_channels=1, distribution=dist,
        cnn_chs=[16, 32, 64], z_channels=64, encoder_vit_layers=1,
        decoder_vit_layers=1, patch_size=4,
    )


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


def test_tp_rules_hit_transformer_kernels():
    model = _tiny_model()
    x = jax.random.uniform(KEY, (2, 32, 32, 1))
    params = model.init({"params": KEY, "sample": KEY}, x)["params"]
    mesh = create_mesh((4, 2))
    shardings = infer_param_sharding(mesh, params)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    model_sharded = [
        "/".join(getattr(k, "key", str(k)) for k in path)
        for path, s in leaves
        if s.spec != P()
    ]
    assert any("Attention_0" in p for p in model_sharded)
    assert any("SwiGLU_0" in p for p in model_sharded)


def test_dp_step_matches_single_device():
    """The sharded step computes the same loss as the unsharded step for
    the same global batch and key (same math, different placement)."""
    model = _tiny_model()
    x = jax.random.uniform(KEY, (8, 32, 32, 1)) * 2 - 1
    state1 = create_train_state(KEY, model, x[:2], optimizer="adamw", lr=1e-4)
    state2 = create_train_state(KEY, model, x[:2], optimizer="adamw", lr=1e-4)

    step_single = make_cnn_train_step(model)
    _, losses_single = step_single(state1, x, KEY, jnp.float32(1.0))

    mesh = create_mesh((8, 1))
    state2 = shard_state(mesh, state2)
    xs = jax.device_put(x, data_sharding(mesh, 4))
    step_sharded = make_sharded_cnn_train_step(model, mesh)
    with mesh:
        _, losses_sharded = step_sharded(state2, xs, KEY, jnp.float32(1.0))

    np.testing.assert_allclose(
        float(losses_single["total_loss"]),
        float(losses_sharded["total_loss"]),
        rtol=2e-4,
    )


def test_dp_tp_mesh_step_runs():
    model = _tiny_model()
    x = jax.random.uniform(KEY, (8, 32, 32, 1)) * 2 - 1
    state = create_train_state(KEY, model, x[:2], optimizer="adamw", lr=1e-4)
    mesh = create_mesh((4, 2))
    state = shard_state(mesh, state)
    xs = jax.device_put(x, data_sharding(mesh, 4))
    step = make_sharded_cnn_train_step(model, mesh)
    with mesh:
        state, losses = step(state, xs, KEY, jnp.float32(1.0))
        state, losses = step(state, xs, jax.random.fold_in(KEY, 1),
                             jnp.float32(1.0))
    assert np.isfinite(float(losses["total_loss"]))


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_dryrun_under_driver_env():
    """Regression for MULTICHIP_r01/r02: the driver exports
    JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8, but the
    axon sitecustomize pins the live backend to ONE device anyway.  The
    env-var-sniffing dryrun trusted the env, ran inline, and died with
    "need 8 devices, have 1".  Simulate exactly that mismatch (env claims
    8, live backend pinned to 1 via jax_num_cpu_devices) in a subprocess
    and require dryrun_multichip(8) to succeed by re-exec'ing itself."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import os, sys\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "flags = [f for f in os.environ.get('XLA_FLAGS', '').split()\n"
        "         if 'force_host_platform' not in f]\n"
        "flags.append('--xla_force_host_platform_device_count=8')\n"
        "os.environ['XLA_FLAGS'] = ' '.join(flags)\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_num_cpu_devices', 1)\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        f"sys.path.insert(0, {repo!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRIVER_ENV_DRYRUN_OK')\n"
    )
    r = subprocess.run(
        [_sys.executable, "-c", script],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "DRIVER_ENV_DRYRUN_OK" in r.stdout
    assert "dryrun_multichip OK" in r.stdout


def test_live_device_probe_survives_hanging_backend(monkeypatch):
    """When the TPU tunnel is unreachable, jax.devices() can HANG (not
    raise) inside backend init — observed live: >9 min with no output.
    The dryrun gate must not depend on TPU health (its mesh is a virtual
    CPU one), so the probe has a deadline and an unanswered probe counts
    as 0 devices, routing into the CPU-pinned re-exec child."""
    import threading
    import time

    import __graft_entry__ as g

    def hang():
        time.sleep(3600)

    monkeypatch.setattr(g.jax, "devices", hang)
    t0 = time.time()
    assert g._live_device_count(timeout_s=1.0) == 0
    assert time.time() - t0 < 10
    # and a probe that answers in time still reports the real count
    monkeypatch.setattr(g.jax, "devices", lambda: [object()] * 8)
    assert g._live_device_count(timeout_s=5.0) == 8
    del threading  # (only to document the probe is thread-based)


def test_runner_trains_under_mesh_and_matches_single_device():
    """VERDICT r02 item 2: a user command trains the flagship model under
    pjit DP.  Drive runners.cnn_runner.train_model with --mesh dp /
    --mesh 4x2 on the 8-device CPU mesh and require the training result to
    match the single-device run (same data, same keys) within tolerance."""
    from types import SimpleNamespace

    from cliffordtpu.runners.cnn_runner import train_model

    def make_args(mesh=None, mesh_mode="replicated"):
        return SimpleNamespace(
            cur_lr=1e-3, use_learnable_beta=False, epochs=2, batch_size=8,
            warmup_epochs=1, cycle_epochs=4, min_beta=0.1, max_beta=1.0,
            patience=0, mesh=mesh, mesh_mode=mesh_mode, scan_epochs=False,
        )

    model = _tiny_model()
    rng = np.random.default_rng(0)
    x_train = rng.uniform(-1, 1, (24, 32, 32, 1)).astype(np.float32)
    x_test = rng.uniform(-1, 1, (8, 32, 32, 1)).astype(np.float32)

    _, best_single, _ = train_model(
        make_args(), model, x_train, x_test, KEY)
    _, best_dp, _ = train_model(
        make_args(mesh="dp"), model, x_train, x_test, KEY)
    _, best_tp, _ = train_model(
        make_args(mesh="4x2"), model, x_train, x_test, KEY)

    assert np.isfinite(best_single)
    np.testing.assert_allclose(best_dp, best_single, rtol=2e-4)
    np.testing.assert_allclose(best_tp, best_single, rtol=2e-4)

    # bad specs fail loudly
    with pytest.raises(ValueError, match="divisible"):
        bad = make_args(mesh="dp")
        bad.batch_size = 6
        train_model(bad, model, x_train, x_test, KEY)
    with pytest.raises(ValueError, match="scan_epochs"):
        bad = make_args(mesh="dp")
        bad.scan_epochs = True
        train_model(bad, model, x_train, x_test, KEY)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    loss = float(compiled(*args))
    assert np.isfinite(loss)


def test_make_global_batch_single_process():
    from cliffordtpu.parallel.data import make_global_batch

    mesh = create_mesh((8, 1))
    x = np.random.default_rng(0).normal(size=(16, 4)).astype(np.float32)
    arr = make_global_batch(mesh, x)
    assert arr.shape == (16, 4)
    # sharded over the data axis: each device holds 2 rows
    assert len(arr.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(arr), x)


def test_fsdp_mode_shards_params_and_matches_single_device():
    """mode="fsdp" (ZeRO-3 via GSPMD annotations), stressed beyond one
    step (VERDICT r02 item 9): 5 training steps FSDP on an 8-way data
    axis vs the single-device step agree at every step, large leaves are
    sharded exactly 8x per device, and total per-device param+moment
    bytes genuinely shrink."""
    from cliffordtpu.parallel.sharding import _fsdp_rule  # noqa: F401

    model = _tiny_model()
    x = jax.random.uniform(KEY, (8, 32, 32, 1)) * 2 - 1
    state1 = create_train_state(KEY, model, x[:2], optimizer="adamw",
                                lr=1e-4)
    state2 = create_train_state(KEY, model, x[:2], optimizer="adamw",
                                lr=1e-4)

    mesh = create_mesh((8, 1))
    # lower the min-size cutoff so the tiny test model's leaves behave
    # like a production model's (most bytes above the cutoff)
    state2 = shard_state(mesh, state2, mode="fsdp", fsdp_min_size=2 ** 10)

    def leaf_is_data_sharded(leaf):
        s = getattr(leaf, "sharding", None)
        return (s is not None and hasattr(s, "spec")
                and "data" in jax.tree_util.tree_leaves(tuple(s.spec)))

    def local_vs_global_bytes(tree):
        loc = glob = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            if not hasattr(leaf, "addressable_shards"):
                continue
            glob += leaf.nbytes
            loc += leaf.addressable_shards[0].data.nbytes
        return loc, glob

    sharded = [leaf for leaf in jax.tree_util.tree_leaves(state2.params)
               if leaf_is_data_sharded(leaf)]
    assert sharded, "no parameter leaf was FSDP-sharded"
    # every FSDP-sharded leaf holds exactly 1/8 of its elements per device
    for leaf in sharded:
        local = leaf.addressable_shards[0].data.size
        assert local * 8 == leaf.size, (local, leaf.size)
    # the large leaves dominate, so TOTAL per-device bytes shrink ~8x
    # (not exactly 1/8: norm scales / tiny leaves stay replicated below
    # the min-size cutoff)
    p_loc, p_glob = local_vs_global_bytes(state2.params)
    assert p_loc < 0.2 * p_glob, (p_loc, p_glob)
    # moments follow their parameters
    m_sharded = [leaf for leaf in jax.tree_util.tree_leaves(state2.opt_state)
                 if leaf_is_data_sharded(leaf)]
    assert m_sharded, "no optimizer moment was FSDP-sharded"
    m_loc, m_glob = local_vs_global_bytes(state2.opt_state)
    assert m_loc < 0.3 * m_glob, (m_loc, m_glob)

    step_single = make_cnn_train_step(model)
    step_fsdp = make_sharded_cnn_train_step(model, mesh)
    beta = jnp.float32(1.0)
    for i in range(5):
        k = jax.random.fold_in(KEY, i)
        state1, l1 = step_single(state1, x, k, beta)
        state2, l2 = step_fsdp(state2, x, k, beta)
        np.testing.assert_allclose(float(l1["total_loss"]),
                                   float(l2["total_loss"]),
                                   rtol=5e-5, atol=2e-4)
        np.testing.assert_allclose(float(l1["grad_norm"]),
                                   float(l2["grad_norm"]),
                                   rtol=5e-4, atol=2e-4)
    # params remain sharded after 5 donated-update steps
    still = [leaf for leaf in jax.tree_util.tree_leaves(state2.params)
             if leaf_is_data_sharded(leaf)]
    assert len(still) == len(sharded)


def test_sharded_step_generalizes_to_sixteen_devices():
    """Sharding generality beyond the driver's 8-device gate: a (4, 4)
    DP x TP mesh on 16 virtual CPU devices compiles and executes the
    sharded train step with a finite loss (subprocess so the 8-device
    conftest platform is not disturbed)."""
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = (
        "import os\n"
        "flags = [f for f in os.environ.get('XLA_FLAGS', '').split()\n"
        "         if 'force_host_platform' not in f]\n"
        "flags.append('--xla_force_host_platform_device_count=16')\n"
        "os.environ['XLA_FLAGS'] = ' '.join(flags)\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax, jax.numpy as jnp, numpy as np\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {repo!r})\n"
        "assert len(jax.devices()) == 16, jax.devices()\n"
        "from cliffordtpu.nn import CliffordARVAE\n"
        "from cliffordtpu.parallel.mesh import create_mesh, data_sharding\n"
        "from cliffordtpu.parallel.sharding import (\n"
        "    make_sharded_cnn_train_step, shard_state)\n"
        "from cliffordtpu.train.state import create_train_state\n"
        "key = jax.random.PRNGKey(0)\n"
        "model = CliffordARVAE(latent_dim=8, image_size=32, in_channels=1,\n"
        "    distribution='clifford', cnn_chs=[16, 32, 64], z_channels=64,\n"
        "    encoder_vit_layers=1, decoder_vit_layers=1, patch_size=4)\n"
        "x = jax.random.uniform(key, (16, 32, 32, 1)) * 2 - 1\n"
        "state = create_train_state(key, model, x[:2], optimizer='adamw',\n"
        "                           lr=1e-4)\n"
        "mesh = create_mesh((4, 4))\n"
        "state = shard_state(mesh, state)\n"
        "xs = jax.device_put(x, data_sharding(mesh, 4))\n"
        "step = make_sharded_cnn_train_step(model, mesh)\n"
        "with mesh:\n"
        "    state, losses = step(state, xs, key, jnp.float32(1.0))\n"
        "    loss = float(losses['total_loss'])\n"
        "assert np.isfinite(loss), loss\n"
        "print('SIXTEEN_DEV_OK', loss)\n"
    )
    r = subprocess.run([_sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=1500)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "SIXTEEN_DEV_OK" in r.stdout


_DIST_WORKER = r"""
import os, sys
import numpy as np
import jax

# the axon sitecustomize pins the platform before env vars apply;
# re-assert CPU before any backend/distributed initialization
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1]); port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, jax.devices()  # 4 local x 2 processes

from jax.sharding import Mesh
from cliffordtpu.parallel.data import make_global_batch

mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
rng = np.random.default_rng(0)
global_x = rng.normal(size=(16, 4)).astype(np.float32)
local = global_x[pid * 8:(pid + 1) * 8]  # this process's shard
arr = make_global_batch(mesh, local)
assert arr.shape == (16, 4), arr.shape
assert len(arr.sharding.device_set) == 8

# round-trip proof: a jitted global reduction over the assembled array
# must equal the full-batch sum on every process
total = float(jax.jit(lambda a: a.sum())(arr))
np.testing.assert_allclose(total, global_x.sum(), rtol=1e-6)

# and each addressable shard holds the right rows of the GLOBAL batch
for s in arr.addressable_shards:
    row = s.index[0].start or 0
    np.testing.assert_array_equal(np.asarray(s.data),
                                  global_x[row:row + 2])
print("DIST OK", pid)
"""


def test_make_global_batch_two_processes(tmp_path):
    """VERDICT r3 item 8: the multi-host path of make_global_batch
    (jax.make_array_from_process_local_data), exercised for real with a
    2-process jax.distributed CPU cluster (4 virtual devices each):
    per-process shard -> global array round-trips, a jitted global
    reduction sees all rows, and every addressable shard holds the
    correct global rows."""
    import subprocess
    import sys

    worker = tmp_path / "dist_worker.py"
    worker.write_text(_DIST_WORKER)
    port = str(29000 + os.getpid() % 1000)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(pid), port],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"DIST OK {pid}" in out
