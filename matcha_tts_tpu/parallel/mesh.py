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


def make_multislice_mesh(n_slices: int,
                         per_slice: Optional[int] = None) -> Mesh:
    """("dcn", "data") mesh for data parallelism across pod slices.

    Gradient all-reduce decomposes into a fast ICI reduce within each
    slice ("data" axis, the minor/contiguous mesh dim) plus a DCN
    all-reduce of one partial per slice ("dcn" axis) — XLA derives both
    from the sharding; no user collectives (SURVEY.md §5, scaling-book
    multi-slice recipe).  On real multi-slice runtimes the device grid
    comes from `mesh_utils.create_hybrid_device_mesh` (DCN-aware
    ordering); elsewhere (CPU simulation, single slice) devices are
    reshaped in enumeration order, which keeps intra-slice groups
    contiguous.
    """
    devices = jax.devices()
    if per_slice is None:
        per_slice = len(devices) // n_slices
        if n_slices * per_slice != len(devices):
            raise ValueError(
                f"{len(devices)} devices do not split into {n_slices} "
                f"slices; pass per_slice explicitly to use a subset")
    used = devices[: n_slices * per_slice]
    # real multi-slice runtimes expose slice_index; there the DCN-aware
    # grid from mesh_utils is REQUIRED (enumeration order may interleave
    # slices, which would put DCN hops on the fast "data" axis) and its
    # errors must propagate, not be papered over
    slice_ids = {getattr(d, "slice_index", 0) for d in used}
    if len(slice_ids) > 1:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=used)
    else:
        # single slice / CPU simulation: enumeration order keeps
        # intra-"slice" groups contiguous
        grid = np.asarray(used).reshape(n_slices, per_slice)
    return Mesh(np.asarray(grid).reshape(n_slices, per_slice),
                ("dcn", "data"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across every data-parallel axis of
    the mesh ("dcn" and/or "data"; "model" stays replicated)."""
    axes = tuple(a for a in mesh.axis_names if a in ("dcn", "data"))
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with the batch axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
