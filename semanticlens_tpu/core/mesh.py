"""Mesh construction and sharding helpers.

The framework's parallelism model (SURVEY.md §2): data parallelism over ICI
for both hot loops, with a single cross-shard top-k merge at finalization.
These helpers standardize how callers build the ``("data",)`` mesh and place
arrays; larger meshes (e.g. ``("data", "model")`` for tensor-sharded
foundation models) can be built the same way and passed to the engines.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, *, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all) local devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(f"Requested {n_devices} devices, only {len(devices)} available")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))


def shard_batch(array, mesh: Mesh, *, axis_name: str = "data"):
    """Place ``array`` with its leading axis split across ``axis_name``."""
    return jax.device_put(array, NamedSharding(mesh, P(axis_name)))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (e.g. model params) across every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
