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
from semanticlens_tpu.data.grain_adapter import host_shard_range
from semanticlens_tpu.ops.topk import TopKState, topk_merge

logger = logging.getLogger(__name__)


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


def local_shard_sweep(engine, params, dataset, batch_size: int, start: int, stop: int, **run_kwargs):
    """One host's sweep over dataset rows [start, stop) with global ids.

    An empty shard (small dataset, many hosts) still returns states of the
    full (n_latents, k) shape — every process must contribute identically
    shaped tensors to the cross-host allgather, and ``engine.run``'s
    empty-dataset early return uses a (1, k) placeholder that would wreck it.
    """
    if stop == start:
        shape, dtype = engine._probe_shape(dataset, batch_size)
        states = engine._init_states(engine.infer_n_latents(params, shape, dtype))
        return engine._finalize(states), 0
    local = Subset(dataset, start, stop)
    states, seen = engine.run(params, local, batch_size, id_offset=start, **run_kwargs)
    assert seen == stop - start, f"host swept {seen} samples, shard holds {stop - start}"
    return states, seen


def collect_multihost(engine, params, dataset, batch_size: int, **run_kwargs):
    """Full multi-host Collect sweep; returns (merged states, global n).

    The local sweep accepts every ``CollectEngine.run`` kwarg (checkpointing
    included — each host checkpoints its own shard progress independently).
    """
    n = len(dataset)
    start, stop = host_shard_range(n)
    logger.info(
        "process %d/%d collecting shard [%d, %d) of %d",
        jax.process_index(), jax.process_count(), start, stop, n,
    )
    states, _seen = local_shard_sweep(engine, params, dataset, batch_size, start, stop, **run_kwargs)
    return merge_states_across_processes(states), n
