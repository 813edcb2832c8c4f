"""Host-side data pipeline: datasets, fixed-shape batching, prefetch."""

from semanticlens_tpu.data.dataset import (
    ArrayDataset,
    Batch,
    device_prefetch_batches,
    iter_batches,
    prefetch_batches,
)
from semanticlens_tpu.data.image_folder import ImageFolder

__all__ = [
    "ArrayDataset",
    "Batch",
    "ImageFolder",
    "iter_batches",
    "prefetch_batches",
    "device_prefetch_batches",
]

from semanticlens_tpu.data.grain_adapter import GrainDataset, host_shard_range  # noqa: E402

__all__ += ["GrainDataset", "host_shard_range"]
