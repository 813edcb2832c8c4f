"""Multi-host (DCN) Collect: per-host input shards + global top-k merge.

SURVEY.md §2 scopes DCN to the input pipeline: on a multi-host slice each
process streams only its own contiguous shard of the dataset (sample ids stay
*global* via ``id_offset``), does a fully local sweep — its own devices, its
own mesh — and the single cross-host exchange is the final top-k merge, a
(n_latents × k) state per layer, i.e. kilobytes, not the dataset. The
reference has no multi-host story (single-GPU torch DataLoader); this is the
TPU-native design for it.

Usage on an N-process slice (after ``jax.distributed.initialize``)::

    engine = CollectEngine(model, layers, agg_fn, k)          # local devices
    states, seen = collect_multihost(engine, params, dataset, batch_size)
    # every process returns the same globally-merged states

Verified by a real 2-process CPU test (tests/test_multihost.py) and a
single-process shard-math simulation.
"""

from __future__ import annotations

import logging

import numpy as np

import jax

from semanticlens_tpu.data.dataset import Subset
from semanticlens_tpu.data.grain_adapter import GrainShardDataset, host_shard_range
from semanticlens_tpu.ops.topk import TopKState, topk_merge

logger = logging.getLogger(__name__)


def _shard_view(dataset):
    """(start, stop, per-host dataset view) for the local shard.

    A :class:`GrainShardDataset` IS already this host's shard (grain's
    ``even_split`` tiling, worker-parallel stream) — use its own range so the
    sample ids in the stream match the ownership used by the row exchange.
    Everything else shards by :func:`host_shard_range` + :class:`Subset`.
    """
    if isinstance(dataset, GrainShardDataset):
        return dataset.start, dataset.stop, dataset
    n = len(dataset)
    start, stop = host_shard_range(n)
    return start, stop, (Subset(dataset, start, stop) if stop > start else None)


def merge_states_across_processes(states: dict[str, TopKState]) -> dict[str, TopKState]:
    """All-gather per-process top-k states and select the global top-k.

    Each process contributes its (C, k) state per layer; the gathered
    (P, C, k) stack goes through the same deterministic
    :func:`~semanticlens_tpu.ops.topk.topk_merge` used for per-device shards,
    so multi-host, multi-device, and single-chip sweeps all produce identical
    ids (sentinel tie-break included). No-op on a single process.
    """
    if jax.process_count() == 1:
        return states
    from jax.experimental import multihost_utils

    merged = {}
    for name, st in states.items():
        stacked_vals = multihost_utils.process_allgather(np.asarray(st.values))
        stacked_ids = multihost_utils.process_allgather(np.asarray(st.ids))
        merged[name] = jax.tree.map(
            np.asarray, topk_merge(TopKState(values=stacked_vals, ids=stacked_ids))
        )
    return merged


def _global_len(dataset) -> int:
    """Global dataset size: a GrainShardDataset's len is its SHARD length."""
    if isinstance(dataset, GrainShardDataset):
        return len(dataset.source)
    return len(dataset)


def _probe_view(dataset):
    """Random-access view usable for shape probing even on an empty shard."""
    if isinstance(dataset, GrainShardDataset):
        return dataset.global_view()
    return dataset


def local_shard_sweep(
    engine, params, dataset, batch_size: int, start: int, stop: int, *, local=None, **run_kwargs
):
    """One host's sweep over dataset rows [start, stop) with global ids.

    An empty shard (small dataset, many hosts) still returns states of the
    full (n_latents, k) shape — every process must contribute identically
    shaped tensors to the cross-host allgather, and ``engine.run``'s
    empty-dataset early return uses a (1, k) placeholder that would wreck it.

    ``local`` overrides the per-host view (a GrainShardDataset IS its shard);
    by default rows [start, stop) of ``dataset`` are wrapped in a Subset.
    """
    if stop == start:
        shape, dtype = engine._probe_shape(_probe_view(dataset), batch_size)
        states = engine._init_states(engine.infer_n_latents(params, shape, dtype))
        return engine._finalize(states), 0
    if local is None:
        local = Subset(dataset, start, stop)
    states, seen = engine.run(params, local, batch_size, id_offset=start, **run_kwargs)
    assert seen == stop - start, f"host swept {seen} samples, shard holds {stop - start}"
    return states, seen


def collect_multihost(engine, params, dataset, batch_size: int, **run_kwargs):
    """Full multi-host Collect sweep; returns (merged states, global n).

    The local sweep accepts every ``CollectEngine.run`` kwarg (checkpointing
    included — each host checkpoints its own shard progress independently).
    ``dataset`` may be the full dataset (host_shard_range + Subset) or a
    :class:`GrainShardDataset` (grain-sharded worker-parallel stream).
    """
    start, stop, local = _shard_view(dataset)
    n = _global_len(dataset)
    logger.info(
        "process %d/%d collecting shard [%d, %d) of %d",
        jax.process_index(), jax.process_count(), start, stop, n,
    )
    states, _seen = local_shard_sweep(
        engine, params, dataset, batch_size, start, stop, local=local, **run_kwargs
    )
    return merge_states_across_processes(states), n


def _selected_global_ids(states: dict[str, TopKState]) -> np.ndarray:
    """Sorted unique non-sentinel sample ids across all layers' merged top-k."""
    all_ids = np.concatenate([np.asarray(st.ids).ravel() for st in states.values()])
    return np.unique(all_ids[all_ids >= 0])


def gather_selected_rows(
    needed_ids: np.ndarray, local_rows: np.ndarray, shard_start: int, shard_stop: int
) -> np.ndarray:
    """(M, D) embedding rows for ``needed_ids``, exchanged across hosts.

    Each host owns the rows of its shard [shard_start, shard_stop); it fills
    its slice of an (M, D) buffer and the cross-host exchange is an
    allgather-then-sum (every id has exactly one owner, so summing the
    per-host buffers reconstructs the table). Wire cost is O(M·D) — the
    *selected* rows only, never the full (N, D) embedding table; for a
    ResNet-50 audit (≤ 51k unique ids × 512 dims) that is ~100 MB over DCN
    versus 2.6 GB for the full ImageNet table.
    """
    m = int(needed_ids.shape[0])
    d = int(local_rows.shape[1]) if local_rows.size else local_rows.shape[-1]
    table = np.zeros((m, d), np.float32)
    in_shard = (needed_ids >= shard_start) & (needed_ids < shard_stop)
    local_idx = needed_ids[in_shard] - shard_start
    table[np.where(in_shard)[0]] = np.asarray(local_rows, np.float32)[local_idx]
    if jax.process_count() == 1:
        return table
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(table)  # (P, M, D)
    return np.asarray(gathered, np.float32).sum(axis=0)


def fused_multihost(
    engine,
    params,
    dataset,
    batch_size: int,
    embed_fn,
    *,
    embed_params=None,
    **run_kwargs,
):
    """Multi-host fused Collect+Embed; returns (states, concept_db, n).

    Design (SURVEY.md §2 DCN scoping): each host runs the fused single-pass
    sweep over its own contiguous dataset shard — global sample ids via
    ``id_offset``, embedding rows kept shard-local — then exactly two small
    cross-host exchanges happen:

    1. the per-layer (C, k) top-k states (kilobytes) merge via
       :func:`merge_states_across_processes`;
    2. only the embedding rows the merged top-k actually selected move via
       :func:`gather_selected_rows`.

    ``concept_db[layer]`` is (C, k, D) float32 with zero rows at −1
    sentinels — identical to a single-host fused sweep + gather (tested).
    Every process returns the same result.
    """
    start, stop, local = _shard_view(dataset)
    n = _global_len(dataset)
    logger.info(
        "process %d/%d fused sweep over shard [%d, %d) of %d",
        jax.process_index(), jax.process_count(), start, stop, n,
    )
    if stop == start:
        shape, dtype = engine._probe_shape(_probe_view(dataset), batch_size)
        states = engine._finalize(
            engine._init_states(engine.infer_n_latents(params, shape, dtype))
        )
        local_embeds = np.zeros((0, 1), np.float32)
    else:
        states, local_embeds, seen = engine.run_fused(
            params, local, batch_size, embed_fn, embed_params=embed_params,
            id_offset=start, **run_kwargs,
        )
        assert seen == stop - start

    merged = merge_states_across_processes(states)
    needed = _selected_global_ids(merged)

    if local_embeds.shape[0] == 0 and needed.size:
        # Empty shard: the exchange still needs the right embedding width.
        # Traceable contracts are probed for free with eval_shape; the legacy
        # per-batch contract permits non-traceable host-side work (engine
        # docstring), so fall back to actually embedding one real image —
        # every host can read the full dataset, only the shard was empty.
        import jax.numpy as jnp

        from semanticlens_tpu.data.dataset import get_image

        shape, dtype = engine._probe_shape(_probe_view(dataset), batch_size)
        try:
            spec = jax.ShapeDtypeStruct(shape, dtype)
            if embed_params is not None:
                out = jax.eval_shape(lambda p, x: embed_fn(p, x), embed_params, spec)
            else:
                out = jax.eval_shape(embed_fn, spec)
            width = int(out.shape[-1])
        except Exception:
            probe = jnp.asarray(np.stack([get_image(_probe_view(dataset), 0)]))
            out = embed_fn(embed_params, probe) if embed_params is not None else embed_fn(probe)
            width = int(np.asarray(out).shape[-1])
        local_embeds = np.zeros((0, width), np.float32)

    rows = gather_selected_rows(needed, local_embeds, start, stop)
    pos = {int(i): p for p, i in enumerate(needed)}

    concept_db = {}
    for name, st in merged.items():
        ids = np.asarray(st.ids)
        c, k = ids.shape
        d = rows.shape[1]
        db = np.zeros((c, k, d), np.float32)
        flat = ids.ravel()
        valid = flat >= 0
        db.reshape(c * k, d)[valid] = rows[[pos[int(i)] for i in flat[valid]]]
        concept_db[name] = db
    return merged, concept_db, n
