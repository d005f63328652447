"""Device mesh + sharding helpers (SURVEY.md §2 parallelism table, §5).

The reference is single-device; the rebuild's parallelism is the idiomatic
TPU answer: a 1-D `Mesh(('data',))` over ICI, batch arrays sharded on the
'data' axis, parameters/optimizer state replicated, and the gradient
all-reduce inserted by XLA from the sharding annotations alone — no
user-visible collectives, no NCCL-equivalent layer (that IS the design; see
SURVEY.md §5 "Distributed comm backend"). TP/PP/EP are documented non-goals
for a ~25M-param conv model (SURVEY.md §2). The one extra axis with real
scale-out value — the rasterizer's image rows at high resolution — is
covered by parallel/render_sp.py (2-D ('data','render') mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_pytree(batch, mesh: Mesh):
    """Place every leaf of a host batch with its batch dim sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate_pytree(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
