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

import numpy as np

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


def grain_shard_range(
    n_total: int, *, process_index: int | None = None, process_count: int | None = None
):
    """[start, stop) of this host's shard under grain's ``even_split``.

    Grain hands the first ``n % shard_count`` shards one extra record —
    slightly different tiling from :func:`host_shard_range` (ceil-per-shard).
    The grain-backed collect path must use THIS split so that sample ids in
    the stream match the shard ownership used for the embedding-row exchange
    (pinned against ``grain._src.core.sharding.even_split`` in tests).
    """
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_total, pc)
    start = pi * base + min(pi, rem)
    return start, start + base + (1 if pi < rem else 0)


class GrainShardDataset:
    """THIS host's contiguous shard of a grain data source, decoded by grain.

    The real multi-host input pipeline (SURVEY §2: DCN input via Grain): a
    ``grain.python.DataLoader`` drives an ``IndexSampler`` sharded by
    ``jax.process_index()`` with ``worker_count`` decode processes, and its
    batches feed the engine through the dataset protocol's ``iter_batches``
    hook. Random access (``__getitem__``) stays available for shape probing
    and rendering; the hot sweep goes through the worker-parallel stream.

    Parameters
    ----------
    source : random-access grain data source (``__len__`` + ``__getitem__``).
    transform : optional record → uint8 HWC image (or (image, label))
        converter, applied in grain workers. Must be picklable when
        ``worker_count > 0``.
    worker_count : grain decode processes (0 = in-process).
    process_index / process_count : override the jax process topology
        (single-process tests simulate multi-host shards with these).
    """

    def __init__(
        self,
        source,
        *,
        transform=None,
        name: str | None = None,
        worker_count: int = 0,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        import jax

        self.source = source
        self.transform = transform
        self.worker_count = worker_count
        self._pi = jax.process_index() if process_index is None else process_index
        self._pc = jax.process_count() if process_count is None else process_count
        self.start, self.stop = grain_shard_range(
            len(source), process_index=self._pi, process_count=self._pc
        )
        if name is not None:
            self.name = name

    def __len__(self):
        return self.stop - self.start

    def __getitem__(self, idx: int):
        if not 0 <= idx < len(self):
            raise IndexError(idx)
        record = self.source[self.start + idx]
        return self.transform(record) if self.transform is not None else record

    def __repr__(self):
        return (
            f"GrainShardDataset(shard={self._pi}/{self._pc}, "
            f"range=[{self.start}, {self.stop}), workers={self.worker_count})"
        )

    def global_view(self):
        """Random-access view over the FULL source (transform applied) —
        shape probing must work even when this host's shard is empty."""
        return GrainDataset(self.source, transform=self.transform,
                            name=getattr(self, "name", None))

    def iter_batches(self, batch_size: int, *, pad_last: bool = True, start_index: int = 0):
        """Worker-parallel grain stream → framework ``Batch``es.

        Pipeline: ``grain.MapDataset.source(...)[start:stop].batch(...)
        .to_iter_dataset().mp_prefetch(workers)`` — the slice is exactly the
        ``IndexSampler``/``ShardOptions`` shard (``grain_shard_range`` is
        pinned against grain's ``even_split`` in tests), decode runs inside
        the worker processes, and ``mp_prefetch`` restores deterministic
        batch order. The legacy ``DataLoader`` + per-worker ``Batch`` path
        is deliberately NOT used: grain 0.2.15's zero-worker reader DROPS the
        shard's remainder record and its multi-worker reader interleaves
        per-worker batches (ids [0, 2, 4, …]) — both silently corrupt global
        sample ids (pinned by the coverage tests beside this class).

        ``start_index`` (local, batch-aligned) resumes mid-shard by SLICING
        the stream — pre-resume records are never decoded (a checkpointed
        90%-done sweep must not pay O(shard) decode on resume).
        """
        import grain

        from semanticlens_tpu.data.dataset import Batch

        if start_index % batch_size:
            raise ValueError(
                f"start_index {start_index} must be a multiple of batch_size {batch_size}"
            )
        resume_at = self.start + min(start_index, len(self))
        md = grain.MapDataset.source(_IndexedSource(self.source, self.transform))
        stream = md[resume_at : self.stop].batch(batch_size, drop_remainder=False)
        it = stream.to_iter_dataset()
        if self.worker_count:
            it = it.mp_prefetch(
                grain.multiprocessing.MultiprocessingOptions(num_workers=self.worker_count)
            )
        expected_next = resume_at
        for rec in it:
            ids, images = np.asarray(rec["id"]), np.asarray(rec["image"])
            # Contiguity guard: anything out of order or dropped silently
            # corrupts global sample ids.
            if int(ids[0]) != expected_next or not (np.diff(ids) == 1).all():
                raise RuntimeError(
                    f"grain stream not contiguous: expected {expected_next}+, got ids {ids}"
                )
            expected_next = int(ids[-1]) + 1
            local_start = int(ids[0]) - self.start
            valid = np.ones(batch_size, bool)
            if images.shape[0] < batch_size:
                if not pad_last:
                    continue
                pad = batch_size - images.shape[0]
                images = np.concatenate(
                    [images, np.zeros((pad, *images.shape[1:]), images.dtype)]
                )
                valid[batch_size - pad :] = False
            yield Batch(images=images, start_index=local_start, valid=valid)
        if expected_next != self.stop:
            raise RuntimeError(
                f"grain stream ended at id {expected_next}, shard stops at {self.stop}"
            )


class _IndexedSource:
    """Grain data source attaching the GLOBAL record key to each record —
    sample ids survive sharding, batching, and worker fan-out."""

    def __init__(self, source, transform):
        self.source = source
        self.transform = transform

    def __len__(self):
        return len(self.source)

    def __getitem__(self, k: int):
        record = self.source[k]
        if self.transform is not None:
            record = self.transform(record)
        if isinstance(record, (tuple, list)):  # (image, label) → image
            record = record[0]
        return {"id": np.int64(k), "image": np.asarray(record)}


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
