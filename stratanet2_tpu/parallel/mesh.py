"""Device mesh + sharding helpers for data-parallel training and inference.

The reference is strictly single-device (SURVEY.md §2.4: no torch.distributed,
no process groups — `--cuda <idx>` selects one GPU). Plots/tiles are i.i.d.
work items, so the natural and sufficient TPU scale-out axis is the batch:
a 1-D `Mesh` over all chips with the batch dimension sharded and parameters
replicated. XLA inserts the gradient all-reduce (psum over ICI) when the
jitted train step consumes sharded batches; nothing NCCL-like is written by
hand. Cross-host scale-out composes this with `jax.distributed.initialize`
plus the per-host file worklist (utils/worklist.py).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over the batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            assert n_devices <= len(devices), (
                f"requested {n_devices}-device mesh, only "
                f"{len(devices)} devices available"
            )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(BATCH_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device-put every array in the pytree with axis-0 sharding; rank-0
    and non-array leaves (scalars, strings riding a batch dict) replicate."""

    def _put(x):
        if np.ndim(x) == 0:
            return jax.device_put(x, replicated(mesh)) if _is_array(x) else x
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    def _is_array(x):
        return isinstance(x, (jax.Array, np.ndarray, np.generic, int, float, complex, bool))

    return jax.tree_util.tree_map(_put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree
    )
