"""Core device kernels: aggregation, streaming top-k, k-means, preprocessing."""

from semanticlens_tpu.ops import aggregators
from semanticlens_tpu.ops.kmeans import batched_kmeans, kmeans
from semanticlens_tpu.ops.topk import (
    TopKState,
    alive_latents,
    init_topk,
    topk_merge,
    topk_update,
    topk_update_jit,
)

__all__ = [
    "aggregators",
    "TopKState",
    "init_topk",
    "topk_update",
    "topk_update_jit",
    "topk_merge",
    "alive_latents",
    "kmeans",
    "batched_kmeans",
]
