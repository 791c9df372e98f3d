"""Device-mesh helpers for ray-batch data parallelism.

The reference has no parallelism of any kind (SURVEY.md §2: single
``cuda:0``). Here scale-out is first-class: a 1-D mesh over all chips, the
per-iteration ray batch sharded along it, the ~50k-param MLP replicated, and
gradient reduction left to XLA (the mean over the globally-sharded loss
lowers to an ICI ``psum``) — the scaling-book recipe: pick a mesh, annotate
shardings, let XLA insert collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray) axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh, axis: str = "data"):
    """Place every array in the pytree with its leading axis sharded over the
    mesh (pads are the caller's responsibility; sizes here must divide)."""
    sh = data_sharding(mesh, axis)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
