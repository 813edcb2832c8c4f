"""Core device/mesh utilities and dtype policy."""

from semanticlens_tpu.core.mesh import (
    backend_reachable,
    data_mesh,
    enable_compilation_cache,
    replicate,
    shard_batch,
    shard_concept_db,
)

__all__ = ["backend_reachable", "data_mesh", "enable_compilation_cache", "replicate",
           "shard_batch", "shard_concept_db"]
