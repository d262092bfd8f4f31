"""Device mesh + sharding helpers.

The reference's only parallelism is Lightning DDP over NCCL
(train_standalone.py:863-868).  The TPU-native equivalent is a 1-D
`jax.sharding.Mesh` over ICI with the batch dimension sharded; XLA inserts
the gradient all-reduce (psum) automatically when the loss is jitted with
these shardings (SURVEY.md §2.3, §5).

Axis names:
  "data"  — data-parallel axis (batch sharded, params replicated)

A second "model" axis is provisioned for future tensor sharding (the
18 M-param model does not need it; kept so meshes created here are
forward-compatible with 2-D layouts on pods).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, data_axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (data_axis,))


def make_mesh_2d(dp: int, mp: int) -> Mesh:
    """(data, model) mesh for layouts that also shard parameters."""
    devices = np.asarray(jax.devices()[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
