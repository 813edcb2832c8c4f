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


def shard_concept_db(concept_db: dict, mesh: Mesh, *, axis_name: str = "data") -> dict:
    """Shard a concept DB over the component axis for mesh-parallel Analyze.

    Every score (clarity, redundancy-per-neuron, polysemanticity/k-means) is
    independent per component, so splitting the leading (n_components) axis
    across the mesh runs the whole Analyze stage data-parallel with zero
    collectives — the jitted score fns consume sharded inputs as-is. Layers
    whose component count does not divide the axis stay replicated (logged).
    """
    import logging

    logger = logging.getLogger(__name__)
    size = mesh.shape[axis_name]
    out = {}
    for name, v in concept_db.items():
        arr = jax.numpy.asarray(v)
        if arr.shape[0] % size == 0:
            out[name] = jax.device_put(arr, NamedSharding(mesh, P(axis_name)))
        else:
            logger.info(
                "layer %s: %d components not divisible by %d-way mesh; kept replicated",
                name,
                arr.shape[0],
                size,
            )
            out[name] = jax.device_put(arr, NamedSharding(mesh, P()))
    return out


def backend_reachable(n_devices: int = 1, *, timeout_s: int = 120) -> bool:
    """True when the configured JAX backend responds with ≥ ``n_devices``.

    On a tunneled accelerator backend a dead tunnel makes the first device
    call hang INDEFINITELY, so the count runs in a short-lived subprocess
    probe; a timed-out or crashed probe counts as unreachable. CPU backends
    cannot hang and are counted in-process. Shared by the benchmark
    (fail-fast with an error line) and the multi-chip dryrun (fall back to
    the virtual CPU mesh).
    """
    import subprocess
    import sys

    if jax.config.jax_platforms == "cpu":
        return jax.device_count() >= n_devices
    try:
        proc = subprocess.run(
            [sys.executable, "-c", "import jax; print(jax.device_count())"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return proc.returncode == 0 and int(proc.stdout.strip() or 0) >= n_devices
    except (subprocess.TimeoutExpired, ValueError):
        return False


def enable_compilation_cache(directory: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent).

    Repeat runs of the audit/bench entry points skip XLA recompilation of the
    big fused programs (tens of seconds per shape on the first run). Safe on
    backends that cannot serialize executables — JAX logs and compiles as
    usual. Returns the cache directory used.

    The default is the REPO-COMMITTED ``.xla_cache/`` directory (a warmed
    cache from a chip run is committed): a fresh driver container on the same
    jax/libtpu build then skips the ~4-minute benchmark warm-up entirely.
    XLA keys entries on the compiler version + topology, so a non-matching
    build simply misses and recompiles. Override with
    ``SEMANTICLENS_XLA_CACHE``.
    """
    import os

    _repo_root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    directory = directory or os.environ.get(
        "SEMANTICLENS_XLA_CACHE", os.path.join(_repo_root, ".xla_cache")
    )
    os.makedirs(directory, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover — ancient jax without the flags
        pass
    return directory
