"""Worker for the 2-process jax.distributed test (see test_multihost.py).

Each process: init the distributed runtime through the production
entrypoint (`maybe_initialize_distributed`), build the GLOBAL mesh over
all processes' devices, generate the same seeded global batch, shard it
with `shard_batch` (which materializes only addressable shards), run a
few vanilla train steps, and print a parameter checksum. Both processes
must print the same checksum, and it must match a single-process run on
the same total device count.

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from consistentnerf_tpu.configs import Config  # noqa: E402
from consistentnerf_tpu.data import synthetic  # noqa: E402
from consistentnerf_tpu.data.pipeline import VanillaBatcher  # noqa: E402
from consistentnerf_tpu.models.factory import make_model  # noqa: E402
from consistentnerf_tpu.parallel import mesh as mesh_lib  # noqa: E402
from consistentnerf_tpu.train import loop as loop_lib  # noqa: E402
from consistentnerf_tpu.train import step as step_lib  # noqa: E402


def main():
    coordinator, num_procs, proc_id = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    )
    mesh_lib.maybe_initialize_distributed(coordinator, num_procs, proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    n_devices = len(jax.devices())

    cfg = Config(
        backbone="vanilla", netdepth=2, netwidth=32, N_samples=8,
        N_importance=0, multires=4, multires_views=2,
        N_rand=n_devices * 16 - 64, n_patches=1, patch_size=8,
        white_bkgd=True, hardmask=True, with_depth_loss=True,
        use_tensorboard=False, seed=7,
    )
    scene = synthetic.make_scene(n_views=4, H=32, W=32).to_scene_data()
    batcher = VanillaBatcher(scene, cfg, seed=7)
    mesh = mesh_lib.create_mesh()  # global: all processes' devices
    assert mesh.devices.size == n_devices

    batch = batcher.next_batch()
    state = loop_lib.init_state(cfg, make_model(cfg), batch)
    ts = step_lib.build_train_step(make_model(cfg), cfg, donate=False)
    key = jax.random.PRNGKey(cfg.seed)
    sharded = mesh_lib.shard_batch(batch, mesh)
    # Verify per-leaf shard sizing against the local_batch_slice contract.
    n_local = mesh_lib.local_batch_slice(batch["rgb"].shape[0])
    got_local = sum(
        s.data.shape[0] for s in sharded["rgb"].addressable_shards
    )
    assert got_local == n_local, (got_local, n_local)

    for _ in range(3):
        state, stats = ts(state, sharded, key)
        sharded = mesh_lib.shard_batch(batcher.next_batch(), mesh)
    loss = float(stats["loss"])
    k = np.asarray(
        jax.device_get(state.params["params"]["coarse"]["pts_0"]["kernel"])
    )
    print(f"CHECKSUM {float(np.abs(k).sum()):.8f} LOSS {loss:.8f}",
          flush=True)


if __name__ == "__main__":
    main()
