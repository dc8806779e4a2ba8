"""Checkpoint restore robustness.

Read-only consumers (eval/render/export CLIs) restore trained params via
`CheckpointManager.restore_for_eval`, which must tolerate an opt_state
pytree mismatch: requiring the eval invocation to repeat the training
run's exact optimizer hyperparameters (grad clips, schedules) just to
make the optimizer state STRUCTURE match is a footgun (found driving the
mip eval with different grad-clip flags than train; see RUNS_r4.md).
"""

import numpy as np
import pytest

from consistentnerf_tpu.configs import Config
from consistentnerf_tpu.data import synthetic
from consistentnerf_tpu.train import loop as loop_lib
from consistentnerf_tpu.train.checkpoints import CheckpointManager


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(n_views=4, H=16, W=16).to_scene_data()


def _mini_cfg(**kw):
    base = dict(
        dataset_type="synthetic", backbone="vanilla", netdepth=2,
        netwidth=16, N_samples=4, N_importance=0, multires=2,
        multires_views=2, N_rand=8, n_patches=0, use_tensorboard=False,
    )
    base.update(kw)
    return Config(**base)


def test_restore_for_eval_tolerates_optimizer_mismatch(scene, tmp_path):
    from consistentnerf_tpu.models.factory import make_model

    cfg_train = _mini_cfg(grad_max_norm=0.1, grad_max_val=0.1)
    model = make_model(cfg_train)
    batcher = loop_lib.make_batcher(scene, cfg_train)
    state = loop_lib.init_state(cfg_train, model, batcher.next_batch())
    state = state.replace(step=np.asarray(7, np.int32))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state)
    mgr.wait()

    # A DIFFERENT optimizer chain (no clips) -> different opt_state tree.
    cfg_eval = _mini_cfg(grad_max_norm=0.0, grad_max_val=0.0)
    state_eval = loop_lib.init_state(cfg_eval, model, batcher.next_batch())
    restored = CheckpointManager(str(tmp_path / "ckpt")).restore_for_eval(
        state_eval
    )
    assert int(restored.step) == 7
    a = jax_leaves(restored.params)
    b = jax_leaves(state.params)
    assert all(np.allclose(x, y) for x, y in zip(a, b))

    # The strict path still works when structures match.
    state_eval2 = loop_lib.init_state(cfg_train, model, batcher.next_batch())
    restored2 = CheckpointManager(str(tmp_path / "ckpt")).restore_for_eval(
        state_eval2
    )
    assert int(restored2.step) == 7


def jax_leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]
