"""Device mesh and sharding helpers.

The reference's only parallelism is single-process `nn.DataParallel`
replication (2_aber_aware_dff_aif.py:67).  The TPU-native equivalent is a
`jax.sharding.Mesh` over all chips with batch-dim sharding: parameters are
replicated, per-batch arrays are split along the `data` axis, and XLA inserts
the gradient all-reduce over ICI automatically under `jit`.

Rendering fan-out (focal-stack frames x batch) is embarrassingly parallel and
shards over the same axis.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Shard dim 0 over the mesh, replicate the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put a pytree of arrays with dim-0 sharding over the mesh."""

    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x), axis_name))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)
