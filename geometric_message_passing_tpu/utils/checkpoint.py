"""Checkpoint / resume — a subsystem absent in the reference (no torch.save
anywhere, SURVEY §5); built on orbax, the standard JAX checkpointing stack.

Stores {params, batch_stats, opt_state, metadata} with async-capable
orbax handlers; works with sharded (multi-host) arrays out of the box.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, variables: Dict[str, Any],
                    opt_state: Any = None, step: int = 0,
                    metadata: Optional[dict] = None) -> None:
    path = os.path.abspath(path)
    ckpt = {"variables": variables, "step": step}
    if opt_state is not None:
        ckpt["opt_state"] = opt_state
    if metadata:
        ckpt["metadata"] = metadata
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def load_checkpoint(path: str, template: Optional[dict] = None) -> dict:
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


class CheckpointManager:
    """Rolling checkpoint manager (keep-last-k, best-metric tracking)."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, variables, opt_state=None, metrics=None):
        ckpt = {"variables": variables}
        if opt_state is not None:
            ckpt["opt_state"] = opt_state
        self._mgr.save(step, args=ocp.args.StandardSave(ckpt), metrics=metrics)

    def wait_until_finished(self):
        """Block until in-flight async saves commit.  Orbax saves are async
        by default; a rollback that restores "the latest checkpoint" right
        after a boundary save could otherwise race the background commit."""
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template=None):
        self.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step, args=ocp.args.StandardRestore())

    @property
    def latest_step(self):
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
