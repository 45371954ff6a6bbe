"""Orbax checkpointing with true resume.

Replaces the reference's ``flax.training.checkpoints.save_checkpoint`` on a
``(optimizer, ema, early_stop)`` tuple (``train_ncsn.py:397-399``) with an
Orbax CheckpointManager over a single state pytree. Unlike the reference —
whose train loops never call restore (SURVEY.md §5: training cannot resume) —
``restore_latest`` makes crash-resume a first-class operation.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Thin wrapper: save/restore a state pytree plus scalar metadata."""

    def __init__(self, directory: str, keep: int = 50):
        self._dir = os.path.abspath(os.path.expanduser(directory))
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True),
        )

    def save(self, step: int, state: Any, force: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self):
        self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, target: Any) -> Any:
        """Restore the newest checkpoint into the structure of ``target``.

        Returns ``target`` unchanged when no checkpoint exists.
        """
        step = self._mgr.latest_step()
        if step is None:
            return target
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          target)
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(abstract))

    def close(self):
        self._mgr.close()
