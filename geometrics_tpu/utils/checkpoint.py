"""Checkpoint / resume via orbax (SURVEY.md §5 checkpoint subsystem).

Reference: ``torch.save(state_dict)`` snapshots, re-loaded by path; the
AE-pretrain → main-train handoff is a checkpoint load of the frozen
MeshEncoder.  Here: orbax CheckpointManager for full train state (params +
opt state + step), plus ``load_frozen_encoder`` implementing the same handoff
from an AE run directory.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax wrapper: save/restore pytrees keyed by step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, tree: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(tree))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, tree_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``tree_like`` (abstract ok)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(tree_like))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore a snapshot as raw arrays without a structure template —
        the public path for eval/inference tooling that only has a run dir."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step)

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_frozen_encoder(ae_checkpoint_dir: str, abstract_state: Any) -> Any:
    """The AE→main handoff: pull encoder params out of an AE run directory.

    ``abstract_state`` must mirror the AE train-state structure
    (train/autoencoder.py); returns the ``encoder`` params sub-tree.
    """
    ckpt = Checkpointer(ae_checkpoint_dir)
    restored = ckpt.restore(abstract_state)
    return restored["params"]["encoder"]
