"""Host-side dataset abstraction and fixed-shape batch iteration.

The reference streams data through torch ``DataLoader``s (reference:
activation_based.py:344-349, 414-422). The TPU-native equivalent must produce
**static shapes** for XLA: the last partial batch is padded and accompanied by
a validity mask so padded rows cannot enter the top-k (their aggregated
activations are set to −inf by the collect engine) and are dropped from
embeddings.

Datasets are any sequence: ``len(ds)`` and ``ds[i]`` returning an image or an
``(image, label)`` tuple. ``ArrayDataset`` wraps in-memory numpy arrays with
a zero-copy slicing fast path. ``prefetch_batches`` overlaps host batch
assembly with device compute via a background thread.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Iterator, NamedTuple

import numpy as np


class Batch(NamedTuple):
    """One fixed-shape batch of host data."""

    images: np.ndarray  # (B, H, W, C)
    start_index: int  # global dataset index of row 0
    valid: np.ndarray  # (B,) bool; False for padded rows


class ArrayDataset:
    """In-memory dataset over a (N, H, W, C) array with optional labels.

    A ``.name`` attribute (used for cache identity, reference
    activation_based.py:187-215) can be passed or assigned later.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray | None = None, name: str | None = None):
        self.images = np.asarray(images)
        self.labels = labels
        if name is not None:
            self.name = name

    def __len__(self):
        return len(self.images)

    def __getitem__(self, idx):
        label = self.labels[idx] if self.labels is not None else 0
        return self.images[idx], label

    def __repr__(self):
        return f"ArrayDataset(n={len(self.images)}, shape={self.images.shape[1:]})"


class Subset:
    """Contiguous [start, stop) view of a dataset (multi-host shard view).

    Keeps the parent's fast-path ``images`` attribute when available so
    sliced sweeps stay zero-copy. Cache identity appends the range — a shard
    is not the full dataset.
    """

    def __init__(self, dataset, start: int, stop: int):
        n = len(dataset)
        if not (0 <= start <= stop <= n):
            raise ValueError(f"invalid subset range [{start}, {stop}) for dataset of {n}")
        self.dataset = dataset
        self.start, self.stop = start, stop
        if hasattr(dataset, "images"):
            self.images = dataset.images[start:stop]
        if hasattr(dataset, "get_batch"):
            self.get_batch = lambda s, e: dataset.get_batch(start + s, start + e)
        if hasattr(dataset, "name"):
            self.name = f"{dataset.name}[{start}:{stop}]"

    def __len__(self):
        return self.stop - self.start

    def __getitem__(self, idx: int):
        if idx < 0 or idx >= len(self):
            raise IndexError(idx)
        return self.dataset[self.start + idx]

    def __repr__(self):
        return f"Subset({self.dataset!r}, [{self.start}:{self.stop}))"


def get_image(dataset, idx: int) -> np.ndarray:
    """Image at ``idx`` regardless of whether items are bare or (image, label)."""
    return np.asarray(_extract_image(dataset[idx]))


def _extract_image(item):
    if isinstance(item, (tuple, list)):
        return item[0]
    return item


def iter_batches(
    dataset, batch_size: int, *, pad_last: bool = True, start_index: int = 0
) -> Iterator[Batch]:
    """Yield fixed-shape :class:`Batch` es in dataset order.

    The final short batch is zero-padded to ``batch_size`` with
    ``valid=False`` rows (skipped when ``pad_last=False`` would break static
    shapes, so padding is always applied; the flag exists to drop an entirely
    empty tail). ``start_index`` resumes iteration mid-dataset (must be a
    batch boundary used by a previous run for ids to line up).
    """
    custom = getattr(dataset, "iter_batches", None)
    if custom is not None:
        # Datasets owning their own stream (GrainShardDataset: worker-parallel
        # grain decode) produce the batches directly.
        yield from custom(batch_size, pad_last=pad_last, start_index=start_index)
        return

    n = len(dataset)
    fast_images = getattr(dataset, "images", None)
    get_batch = getattr(dataset, "get_batch", None)  # native threaded decode

    for start in range(start_index, n, batch_size):
        stop = min(start + batch_size, n)
        if fast_images is not None:
            block = np.asarray(fast_images[start:stop])
        elif get_batch is not None:
            block = np.asarray(get_batch(start, stop))
        else:
            block = np.stack([np.asarray(_extract_image(dataset[i])) for i in range(start, stop)])
        valid = np.ones(batch_size, bool)
        if stop - start < batch_size:
            if not pad_last:
                continue
            pad = batch_size - (stop - start)
            block = np.concatenate([block, np.zeros((pad, *block.shape[1:]), block.dtype)])
            valid[stop - start :] = False
        yield Batch(images=block, start_index=start, valid=valid)


def device_prefetch_batches(
    batch_iter: Iterator[Batch], depth: int = 3, sharding=None, put_threads: int = 2
):
    """Prefetch batches AND start their host→device uploads ahead of compute.

    Yields ``(images_on_device, start_index, valid_host)`` in order. Images
    keep their host dtype (ship uint8, normalize on device — host↔device
    bandwidth, not the VPU, bounds this workload). Up to ``depth`` uploads
    are in flight, issued from ``put_threads`` workers so transfers overlap
    both compute and each other. ``sharding`` optionally places each upload
    directly into a mesh sharding.
    """
    import concurrent.futures as cf

    import jax

    def put(batch: Batch):
        # Transient transport failures (remote/tunneled device runtimes) are
        # retried once before surfacing — a single flaky transfer should not
        # kill an hours-long sweep whose state is checkpointable.
        for attempt in (0, 1):
            try:
                if sharding is not None:
                    images = jax.device_put(batch.images, sharding)
                else:
                    images = jax.device_put(batch.images)
                break
            except Exception:
                if attempt:
                    raise
                logging.getLogger(__name__).warning(
                    "device_put failed for batch @%d; retrying once", batch.start_index
                )
        # The validity mask is derivable on device from (start_index, n);
        # ship only the images (the mask would be one more small put per step).
        return images, batch.start_index, batch.valid

    def generator():
        with cf.ThreadPoolExecutor(put_threads) as ex:
            pending: list = []
            for batch in batch_iter:
                pending.append(ex.submit(put, batch))
                if len(pending) > depth:
                    yield pending.pop(0).result()
            for fut in pending:
                yield fut.result()

    return generator()


def prefetch_batches(batch_iter: Iterator[Batch], depth: int = 2) -> Iterator[Batch]:
    """Run ``batch_iter`` in a daemon thread with a bounded queue.

    Overlaps host-side image assembly (and any decode) with device compute —
    the TPU-native counterpart of DataLoader worker processes.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    errors: list[BaseException] = []

    def worker():
        try:
            for item in batch_iter:
                q.put(item)
        except BaseException as e:  # surfaced in the consumer
            errors.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if errors:
                raise errors[0]
            return
        yield item
