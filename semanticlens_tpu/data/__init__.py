"""Host-side data pipeline: datasets, fixed-shape batching, prefetch."""

from semanticlens_tpu.data.dataset import (
    ArrayDataset,
    Batch,
    iter_batches,
    prefetch_batches,
)

__all__ = ["ArrayDataset", "Batch", "iter_batches", "prefetch_batches"]
