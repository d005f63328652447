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

    def restore_partial(self, abstract_subtree: Any, step: Optional[int] = None) -> Any:
        """Restore only the keys present in `abstract_subtree`.

        Eval/inference paths need params + BN state but must not depend on
        the TRAINING run's optimizer pytree structure — a checkpoint written
        with e.g. clip-chained AdamW has a different opt_state shape than
        the plain-Adam abstract state a preset would build, and a full
        StandardRestore refuses the mismatch. Partial restore makes loading
        a model for evaluation optimizer-agnostic.
        """
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        # Template built from the checkpoint's own metadata (shapes/dtypes),
        # with sharding REBOUND to a local device: a template-free restore
        # adopts the SAVED sharding, which names the saving machine's
        # devices — a checkpoint written on the TPU then fails to load on a
        # CPU host with "Device TPU v5 lite0 was not found" (hit when
        # scoring a TPU-trained model during a tunnel outage). Serving hosts
        # are not training hosts; eval restore must be device-portable.
        # (CheckpointManager.item_metadata returns None without a handler
        # registry on this orbax, so read metadata via StandardCheckpointer
        # on the step's item directory.)
        # No structural validation against an abstract state (this orbax has
        # no partial_restore kwarg) — restore all, project onto the
        # requested keys. Eval jits move arrays where they need them.
        import jax

        item_dir = os.path.join(str(self._mgr.directory), str(step), "default")
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(item_dir).item_metadata
        local = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])

        def _to_abstract(m):
            if getattr(m, "shape", None) is not None and getattr(m, "dtype", None) is not None:
                return jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=local)
            return m

        template = jax.tree.map(_to_abstract, meta)
        full = ckptr.restore(item_dir, template)
        missing = [k for k in abstract_subtree if k not in full]
        if missing:
            raise KeyError(f"checkpoint lacks keys {missing}")
        return {k: full[k] for k in abstract_subtree}

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
