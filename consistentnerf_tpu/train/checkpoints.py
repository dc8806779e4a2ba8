"""Checkpointing via orbax (async-capable, pjit-sharding aware).

Replaces the reference's torch `.tar` dumps (`run_nerf_view.py:2001-2016`)
and flax `save_checkpoint` (`RegNeRF/train.py:486-489`). Resume restores
`state.step` and continues (same recovery model: restart-from-checkpoint).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from consistentnerf_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 100,
                 save_interval: int = 1):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, save_interval_steps=save_interval,
            enable_async_checkpointing=True,
        )
        self.mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState):
        self.mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore latest (or given) step into the template `state`."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        return self.mgr.restore(
            step, args=ocp.args.StandardRestore(state)
        )

    def restore_for_eval(self, state: TrainState,
                         step: Optional[int] = None) -> TrainState:
        """Restore params/step only, tolerating opt_state mismatch.

        Read-only consumers (eval/render/export) need the trained params,
        not the optimizer state — requiring the eval invocation to repeat
        the exact optimizer hyperparameters (grad clips, schedules) just
        to make the opt_state PYTREE match the checkpoint is a footgun.
        Falls back to a params+step partial restore when the strict
        restore fails on structure.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        try:
            return self.mgr.restore(
                step, args=ocp.args.StandardRestore(state)
            )
        except (ValueError, TypeError):
            # Template-free raw read: returns the saved tree as plain
            # arrays regardless of the live optimizer structure.
            raw = self.mgr.restore(step)
            return state.replace(
                params=jax.tree_util.tree_map(np.asarray, raw["params"]),
                step=np.asarray(raw["step"]),
            )

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def wait(self):
        self.mgr.wait_until_finished()

    def close(self):
        self.mgr.wait_until_finished()
        self.mgr.close()
