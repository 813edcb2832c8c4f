"""Grain integration for production/multi-host input pipelines.

SURVEY.md §2: on multi-host slices, per-host data sharding comes from the
input pipeline (Grain), not from collectives. This adapter exposes a Grain
``MapDataset``/data source as the framework's dataset protocol (len +
``__getitem__`` → uint8 HWC image or (image, label)), so the same
``CollectEngine``/visualizers run unchanged on Grain-backed storage, with a
deterministic global index for cache-stable sample ids.

Gated import: grain is optional (baked into this image; stub elsewhere).
"""

from __future__ import annotations

import logging

logger = logging.getLogger(__name__)


class GrainDataset:
    """Wrap a random-access Grain data source as a framework dataset.

    Parameters
    ----------
    source : object with ``__len__`` and ``__getitem__`` (a
        ``grain.RandomAccessDataSource``, ``grain.MapDataset``, or any
        sequence of records).
    transform : optional record → (uint8 HWC image[, label]) converter; by
        default records pass through (they must already be images or
        (image, label) tuples).
    name : cache identity.
    """

    def __init__(self, source, transform=None, name: str | None = None):
        self.source = source
        self.transform = transform
        if name is not None:
            self.name = name

    def __len__(self):
        return len(self.source)

    def __getitem__(self, idx: int):
        record = self.source[idx]
        if self.transform is not None:
            record = self.transform(record)
        return record

    def __repr__(self):
        return f"GrainDataset(n={len(self.source)}, source={type(self.source).__name__})"


def host_shard_range(n_total: int, *, process_index: int | None = None, process_count: int | None = None):
    """Contiguous [start, stop) sample range owned by this host.

    Multi-host collect: each host streams its own shard (sample ids stay
    global, so the cross-shard top-k merge is correct), while device-level
    sharding within the host is handled by the engine's mesh. Defaults to
    ``jax.process_index()/process_count()``.
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_total // pc)  # ceil
    start = min(pi * per, n_total)
    stop = min(start + per, n_total)
    return start, stop
