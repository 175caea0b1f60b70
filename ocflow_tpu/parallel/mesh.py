"""Device mesh + sharding helpers.

The reference's only (vestigial) parallelism is single-GPU DDP scaffolding
(SURVEY.md §2.9). Here data parallelism is first-class: a 1-D ``('data',)``
mesh by default, with an optional ``('data', 'model')`` 2-D mesh for sharding
the widest conv layers. Gradients are averaged by XLA collectives inserted by
pjit from the sharding annotations — no NCCL-style comm layer to port.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Sequence[int] | None = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    Args:
        axis_shapes: sizes per axis; defaults to all devices on one 'data' axis.
        axis_names: mesh axis names.
        devices: explicit device list (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    devs = np.asarray(devices[: int(np.prod(axis_shapes))]).reshape(axis_shapes)
    return Mesh(devs, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Device-put a pytree of [B, ...] arrays with B sharded over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
