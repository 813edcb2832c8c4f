"""Fused streaming Collect engine: forward → aggregate → top-k in one jit.

This replaces the reference's hot loop (reference: activation_based.py:341-358
+ hook bodies activation_caching.py:403-418), which round-trips aggregated
activations to the host for a CPU top-k every (layer, batch). Here:

- the subject-model forward, all per-layer aggregations, and all top-k merges
  compile into a single XLA program per batch shape;
- the running ``TopKState`` pytree is **donated**, so it is updated in place
  in HBM;
- with a ``jax.sharding.Mesh``, batches are split along the ``data`` axis via
  ``shard_map`` — each device keeps an independent per-shard state, and the
  cross-shard merge (all-candidate concat + re-top-k) happens **once** at
  finalization, not per step (SURVEY.md §2: the only required collective).

Padded rows (static-shape last batch) get −inf activations, which can never
displace the 0.0-initialized slots — preserving the reference's sentinel
semantics bit-for-bit.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semanticlens_tpu.data.dataset import iter_batches, prefetch_batches
from semanticlens_tpu.models.base import SubjectModel
from semanticlens_tpu.ops.topk import TopKState, init_topk, topk_merge, topk_update

logger = logging.getLogger(__name__)


class CollectEngine:
    """Streaming top-k collector over a dataset for a set of tapped layers.

    Parameters
    ----------
    model : SubjectModel with functional ``apply``.
    layer_names : taps to collect.
    aggregation_fn : reduces raw taps to (B, n_components).
    n_collect : top-k per component.
    mesh : optional Mesh with a ``"data"`` axis for multi-chip data
        parallelism. Batch size must be divisible by the axis size.
    """

    def __init__(
        self,
        model: SubjectModel,
        layer_names: Sequence[str],
        aggregation_fn: Callable,
        n_collect: int,
        mesh: Mesh | None = None,
    ):
        self.model = model
        self.layer_names = tuple(layer_names)
        self.aggregation_fn = aggregation_fn
        self.n_collect = n_collect
        self.mesh = mesh
        self.n_shards = mesh.shape["data"] if mesh is not None else 1

    # ----------------------------------------------------------------- shapes
    def infer_n_latents(self, params, batch_shape, dtype=jnp.float32) -> dict[str, int]:
        """Cost-free per-layer component counts via ``jax.eval_shape``."""
        spec = jax.ShapeDtypeStruct(batch_shape, dtype)

        def fn(p, x):
            _, taps = self.model.apply(p, x, self.layer_names)
            return {name: self.aggregation_fn(taps[name]) for name in self.layer_names}

        shapes = jax.eval_shape(fn, params, spec)
        return {name: int(s.shape[-1]) for name, s in shapes.items()}

    # ------------------------------------------------------------------ steps
    def _local_step(self, states, params, images, sample_ids, valid):
        """One shard's update: forward, aggregate, mask padding, merge top-k."""
        _, taps = self.model.apply(params, images, self.layer_names)
        new_states = {}
        for name in self.layer_names:
            agg = self.aggregation_fn(taps[name]).astype(jnp.float32)
            agg = jnp.where(valid[:, None], agg, -jnp.inf)
            new_states[name] = topk_update(states[name], agg, sample_ids)
        return new_states

    def _build_step(self):
        if self.mesh is None:

            @functools.partial(jax.jit, donate_argnums=0)
            def step(states, params, images, sample_ids, valid):
                return self._local_step(states, params, images, sample_ids, valid)

            return step

        mesh = self.mesh

        def sharded(states, params, images, sample_ids, valid):
            # Local views: states (1, C, k) per shard; squeeze the shard axis.
            local = jax.tree.map(lambda a: a[0], states)
            new_local = self._local_step(local, params, images, sample_ids, valid)
            return jax.tree.map(lambda a: a[None], new_local)

        step_sharded = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P("data"), P(), P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
        return jax.jit(step_sharded, donate_argnums=0)

    # -------------------------------------------------------------------- run
    def run(self, params, dataset, batch_size: int, *, prefetch: int = 2):
        """Stream the dataset; returns ``{layer: TopKState}`` globally merged,
        plus the number of samples seen."""
        n = len(dataset)
        if n == 0:
            return {name: init_topk(1, self.n_collect) for name in self.layer_names}, 0
        if batch_size % self.n_shards:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by data-parallel degree {self.n_shards}"
            )

        probe = np.asarray(
            dataset.images[0] if getattr(dataset, "images", None) is not None else _first_image(dataset)
        )
        n_latents = self.infer_n_latents(params, (batch_size, *probe.shape))

        if self.mesh is None:
            states = {name: init_topk(c, self.n_collect) for name, c in n_latents.items()}
        else:
            # Per-shard states with a leading device axis, sharded over "data".
            sharding = NamedSharding(self.mesh, P("data"))
            states = {
                name: TopKState(
                    values=jax.device_put(
                        jnp.zeros((self.n_shards, c, self.n_collect), jnp.bfloat16), sharding
                    ),
                    ids=jax.device_put(
                        jnp.full((self.n_shards, c, self.n_collect), -1, jnp.int32), sharding
                    ),
                )
                for name, c in n_latents.items()
            }

        step = self._build_step()
        data_sharding = (
            NamedSharding(self.mesh, P("data")) if self.mesh is not None else None
        )

        batches = prefetch_batches(iter_batches(dataset, batch_size), depth=prefetch)
        for batch in batches:
            images = jnp.asarray(batch.images, jnp.float32)
            sample_ids = batch.start_index + jnp.arange(batch_size, dtype=jnp.int32)
            valid = jnp.asarray(batch.valid)
            if data_sharding is not None:
                images = jax.device_put(images, data_sharding)
                sample_ids = jax.device_put(sample_ids, data_sharding)
                valid = jax.device_put(valid, data_sharding)
            states = step(states, params, images, sample_ids, valid)

        if self.mesh is not None:
            merge = jax.jit(topk_merge)
            states = {name: merge(st) for name, st in states.items()}
        return states, n


def _first_image(dataset):
    item = dataset[0]
    return item[0] if isinstance(item, (tuple, list)) else item
