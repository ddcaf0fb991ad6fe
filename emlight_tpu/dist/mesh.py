"""Device-mesh construction and data sharding helpers.

The entire multi-GPU layer of the reference — DataParallelWithCallback
scatter/replicate/gather plus the 738-line vendored SyncBN thread-queue
protocol (GenProjector/models/networks/sync_batchnorm/, model_trainer.py:20-24)
— reduces on TPU to: a 1-D data mesh, batch arrays sharded over it, params
replicated, `lax.pmean` for gradients and BN statistics (the BatchNorm modules
take axis_name=DATA_AXIS). Collectives ride ICI; nothing custom.

A `model` axis seam is reserved for tensor parallelism: the reference's models
are small CNNs (no TP/PP needed for parity, SURVEY.md §2.4), but meshes here
are built (data, model) so a sharded variant can land without relayout.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

__all__ = ["DATA_AXIS", "MODEL_AXIS", "make_mesh", "shard_batch", "replicate"]


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with the leading axis sharded over the data axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_leading(tree, multiple: int):
    """Pad every leaf's leading axis up to a multiple (edge-repeat).

    Sharded inference needs the batch divisible by the data-axis size; ragged
    final chunks are padded with copies of the last element and the caller
    trims outputs back to `n`. Returns (padded_tree, n_original).
    """
    leaves = jax.tree.leaves(tree)
    n = leaves[0].shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return tree, n
    def _pad(x):
        reps = np.concatenate([np.arange(n), np.full(pad, n - 1)])
        return x[reps] if hasattr(x, "__getitem__") else x
    return jax.tree.map(_pad, tree), n
