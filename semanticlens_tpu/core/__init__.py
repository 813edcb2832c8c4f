"""Core device/mesh utilities and dtype policy."""

from semanticlens_tpu.core.mesh import (
    data_mesh,
    enable_compilation_cache,
    replicate,
    shard_batch,
    shard_concept_db,
)

__all__ = ["data_mesh", "enable_compilation_cache", "replicate", "shard_batch", "shard_concept_db"]
