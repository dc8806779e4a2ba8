"""Multi-host (2-process) data parallelism actually executes.

Spawns two jax.distributed CPU processes (4 virtual devices each) running
tests/multihost_worker.py through the production multi-host path
(maybe_initialize_distributed + global mesh + shard_batch), and checks:

* both processes agree bitwise on the trained parameters,
* the result matches a single-process run over the same 8 total devices
  (the conftest mesh) — multi-process sharding is a layout choice only.

Reference equivalent: RegNeRF/train.py:302,358-364, datasets.py:487-488.
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    return outs


def _parse(out):
    for line in out.splitlines():
        if line.startswith("CHECKSUM"):
            parts = line.split()
            return float(parts[1]), float(parts[3])
    raise AssertionError(f"no CHECKSUM line in: {out!r}")


def test_two_process_training_matches_single_process():
    outs = _run_workers()
    (c0, l0), (c1, l1) = _parse(outs[0]), _parse(outs[1])
    # Both processes hold identical replicated params.
    assert c0 == c1, (c0, c1)
    assert l0 == l1

    # Ground truth: the same training in THIS process on the 8-device
    # conftest mesh (4 devices x 2 processes == 8 single-process devices).
    from consistentnerf_tpu.configs import Config
    from consistentnerf_tpu.data import synthetic
    from consistentnerf_tpu.data.pipeline import VanillaBatcher
    from consistentnerf_tpu.models.factory import make_model
    from consistentnerf_tpu.parallel import mesh as mesh_lib
    from consistentnerf_tpu.train import loop as loop_lib
    from consistentnerf_tpu.train import step as step_lib

    n_devices = len(jax.devices())
    assert n_devices == 8
    cfg = Config(
        backbone="vanilla", netdepth=2, netwidth=32, N_samples=8,
        N_importance=0, multires=4, multires_views=2,
        N_rand=n_devices * 16 - 64, n_patches=1, patch_size=8,
        white_bkgd=True, hardmask=True, with_depth_loss=True,
        use_tensorboard=False, seed=7,
    )
    scene = synthetic.make_scene(n_views=4, H=32, W=32).to_scene_data()
    batcher = VanillaBatcher(scene, cfg, seed=7)
    mesh = mesh_lib.create_mesh()
    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, make_model(cfg), batch)
    ts = step_lib.build_train_step(make_model(cfg), cfg, donate=False)
    key = jax.random.PRNGKey(cfg.seed)
    sharded = mesh_lib.shard_batch(batch, mesh)
    for _ in range(3):
        state, stats = ts(state, sharded, key)
        sharded = mesh_lib.shard_batch(batcher.next_batch(), mesh)
    k = np.asarray(
        jax.device_get(state.params["params"]["coarse"]["pts_0"]["kernel"])
    )
    ref = float(np.abs(k).sum())
    np.testing.assert_allclose(c0, ref, rtol=1e-5)
    np.testing.assert_allclose(l0, float(stats["loss"]), rtol=1e-4)


def test_local_batch_slice_contract():
    from consistentnerf_tpu.parallel import mesh as mesh_lib

    # Single-process here: the slice is the whole batch. The divisibility
    # check and the per-process shard sizing are asserted inside
    # multihost_worker.py under a real 2-process runtime.
    assert mesh_lib.local_batch_slice(64) == 64 // jax.process_count()
