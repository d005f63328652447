"""Checkpoint / resume via orbax (SURVEY.md §2.12, §5).

The reference saves Keras `.hdf5` weights per epoch with manual resume; the
rebuild checkpoints the full training state — params, BN state, optimizer
state, step counter, and RNG key — so resume restores the exact stream
(step-indexed keys make the data order deterministic, SURVEY.md §5 failure
table).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `abstract_state` (a matching pytree)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract_state))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
