"""Checkpoint/resume for SLAM state (orbax-backed).

The reference persists nothing but the calibration .npz — CSVs are truncated
on every run and the graph dies with the process (SURVEY §5). Long-lived BA
runs need real checkpointing: this module saves/restores the full SLAM state
pytree (GraphState, BAState, or the (graph, ba) tuple the pipeline carries)
with step numbering and retention.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _to_pytree_of_numpy(state: Any):
    return jax.tree.map(lambda x: np.asarray(x), state)


class CheckpointManager:
    """Thin orbax wrapper pinned to our state pytrees."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metadata: dict | None = None) -> None:
        args = self._ocp.args.Composite(
            state=self._ocp.args.StandardSave(_to_pytree_of_numpy(state)),
            **(
                {"metadata": self._ocp.args.JsonSave(metadata)}
                if metadata is not None
                else {}
            ),
        )
        self._mgr.save(step, args=args)
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: int | None = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        out = self._mgr.restore(
            step,
            args=self._ocp.args.Composite(
                state=self._ocp.args.StandardRestore(_to_pytree_of_numpy(template))
            ),
        )
        restored = out["state"]
        # Rebuild with the template's structure (dataclass pytrees round-trip).
        leaves, treedef = jax.tree.flatten(template)
        new_leaves = jax.tree.leaves(restored)
        return jax.tree.unflatten(treedef, [jax.numpy.asarray(x) for x in new_leaves])

    def close(self):
        self._mgr.close()
