"""Fused streaming Collect engine: forward → aggregate → top-k in one jit.

This replaces the reference's hot loop (reference: activation_based.py:341-358
+ hook bodies activation_caching.py:403-418), which round-trips aggregated
activations to the host for a CPU top-k every (layer, batch). Here:

- the subject-model forward, all per-layer aggregations, and all top-k merges
  compile into a single XLA program per batch shape;
- the running ``TopKState`` pytree is **donated**, so it is updated in place
  in HBM;
- input batches ship in their host dtype (uint8 for raw images) and are
  normalized **on device** via ``input_preprocess`` — host→device bandwidth,
  not FLOPs, bounds this workload, so bytes-on-the-wire is the currency;
- uploads are started ahead of compute by a prefetch thread
  (:func:`~semanticlens_tpu.data.dataset.device_prefetch_batches`);
- with a ``jax.sharding.Mesh``, batches split along the ``data`` axis via
  ``shard_map``; each device keeps an independent per-shard state and the
  cross-shard merge happens **once** at finalization (SURVEY.md §2);
- ``run_fused`` additionally embeds every uploaded batch with a foundation
  model in the same pass — Collect + Embed share one upload per image,
  halving data movement vs the reference's two dataset sweeps
  (reference activation_based.py:341-358 then 392-433).

Padded rows (static-shape last batch) get −inf activations, which can never
displace the 0.0-initialized slots — preserving the reference's sentinel
semantics bit-for-bit.
"""

from __future__ import annotations

import functools
import logging
from pathlib import Path
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semanticlens_tpu.data.dataset import device_prefetch_batches, get_image, iter_batches
from semanticlens_tpu.models.base import SubjectModel, interventions_fingerprint
from semanticlens_tpu.ops.topk import TopKState, init_topk, topk_merge, topk_update
from semanticlens_tpu.utils.helper import host_c_array

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
        A mesh with an additional ``"model"`` axis (size > 1) selects the
        GSPMD path: the step is a plain ``jit`` whose batch shards on
        ``"data"`` while the subject's parameters keep whatever shardings
        the caller placed (see ``parallel.llama_param_specs_2d`` /
        ``shard_params``) — XLA GSPMD propagates them through the forward
        and inserts the tensor-parallel collectives on ICI. The top-k
        state stays replicated, so results are bit-stable vs single-chip
        modulo reduction order.
    input_preprocess : optional device-side fn applied to each raw batch
        before the model (e.g. uint8 → normalized float). Defaults to a
        float32 cast.
    """

    def __init__(
        self,
        model: SubjectModel,
        layer_names: Sequence[str],
        aggregation_fn: Callable,
        n_collect: int,
        mesh: Mesh | None = None,
        input_preprocess: Callable | None = None,
    ):
        self.model = model
        self.layer_names = tuple(layer_names)
        self.aggregation_fn = aggregation_fn
        self.n_collect = n_collect
        self.mesh = mesh
        self.n_shards = mesh.shape["data"] if mesh is not None else 1
        # GSPMD (dp × tp) mode: plain jit + sharding propagation instead of
        # shard_map — the only mode where params may be model-sharded.
        self.gspmd = (
            mesh is not None
            and "model" in mesh.axis_names
            and mesh.shape["model"] > 1
        )
        self.input_preprocess = input_preprocess or (lambda x: x.astype(jnp.float32))
        # Memoized jitted steps (rebuilt closures would recompile). Keyed by
        # the active interventions fingerprint: a step traced inside a
        # `models.base.interventions` context bakes the rewrites into the
        # executable, so it must never be reused outside it (and vice versa).
        # Both caches are LRU-bounded (insertion order + eviction) so a
        # long-lived process cycling embed_fns or interventions cannot pin
        # an unbounded set of executables (and their donated-state layouts).
        self._steps: dict[tuple, Callable] = {}
        self._fused_steps: dict[tuple, Callable] = {}  # (id(embed_fn), fp) → step
        self.max_compiled_steps = 8  # per cache; oldest evicted beyond this

    def clear_compiled(self) -> None:
        """Drop every memoized compiled step (they re-trace on next use).

        For long-lived audit processes (serve.py) that cycle many engines,
        embed functions, or interventions contexts — compiled programs pin
        XLA executables and the objects captured in their closures alive.
        """
        self._steps.clear()
        self._fused_steps.clear()

    def _cache_step(self, cache: dict, key, step):
        cache[key] = step
        while len(cache) > self.max_compiled_steps:
            cache.pop(next(iter(cache)))  # evict least recently used
        return step

    def _cache_hit(self, cache: dict, key):
        """Return the cached step, refreshing its recency (true LRU: a hot
        program cycling with cold ones must not be the eviction victim)."""
        step = cache.pop(key)
        cache[key] = step
        return step

    # ----------------------------------------------------------------- shapes
    def infer_n_latents(self, params, batch_shape, dtype=jnp.float32) -> dict[str, int]:
        """Cost-free per-layer component counts via ``jax.eval_shape``."""
        spec = jax.ShapeDtypeStruct(batch_shape, dtype)

        def fn(p, x):
            _, taps = self.model.apply(p, self.input_preprocess(x), self.layer_names)
            return {name: self.aggregation_fn(taps[name]) for name in self.layer_names}

        shapes = jax.eval_shape(fn, params, spec)
        return {name: int(s.shape[-1]) for name, s in shapes.items()}

    # ------------------------------------------------------------------ steps
    def _local_step(self, states, params, images, sample_ids, valid):
        """One shard's update: forward, aggregate, mask padding, merge top-k."""
        x = self.input_preprocess(images)
        _, taps = self.model.apply(params, x, self.layer_names)
        new_states = {}
        for name in self.layer_names:
            agg = self.aggregation_fn(taps[name]).astype(jnp.float32)
            agg = jnp.where(valid[:, None], agg, -jnp.inf)
            new_states[name] = topk_update(states[name], agg, sample_ids)
        return new_states

    def _get_step(self):
        """Jitted step, memoized per engine.

        Sample ids and the padding mask derive on device from two scalars
        (batch start index, dataset length) — per-step host→device traffic is
        the image tensor plus two scalars, nothing else.
        """
        fp = interventions_fingerprint()
        if fp in self._steps:
            return self._cache_hit(self._steps, fp)

        if self.mesh is None or self.gspmd:
            # GSPMD mode pins the (donated) state replicated so every step
            # reuses the same layout — otherwise XLA could leave the updated
            # state sharded however propagation landed, resharding each step.
            out_shardings = (
                NamedSharding(self.mesh, P()) if self.gspmd else None
            )

            @functools.partial(jax.jit, donate_argnums=0, out_shardings=out_shardings)
            def step(states, params, images, start, n_total):
                b = images.shape[0]
                sample_ids = start + jnp.arange(b, dtype=jnp.int32)
                valid = sample_ids < n_total
                return self._local_step(states, params, images, sample_ids, valid)

            return self._cache_step(self._steps, fp, step)

        mesh = self.mesh

        def sharded(states, params, images, start, n_total):
            # Local views: states (1, C, k) per shard; squeeze the shard axis.
            local = jax.tree.map(lambda a: a[0], states)
            b_local = images.shape[0]
            shard = jax.lax.axis_index("data").astype(jnp.int32)
            sample_ids = start + shard * b_local + jnp.arange(b_local, dtype=jnp.int32)
            valid = sample_ids < n_total
            new_local = self._local_step(local, params, images, sample_ids, valid)
            return jax.tree.map(lambda a: a[None], new_local)

        step_sharded = jax.shard_map(
            sharded,
            mesh=mesh,
            in_specs=(P("data"), P(), P("data"), P(), P()),
            out_specs=P("data"),
            check_vma=False,
        )
        step = jax.jit(step_sharded, donate_argnums=0)
        return self._cache_step(self._steps, fp, step)

    def _get_fused_step(self, embed_fn):
        """Combined Collect+Embed step: both networks in ONE XLA program.

        ``embed_fn(embed_params, raw_images) -> (B, D)`` must be traceable.
        Measured on v5e (docs/PERF_NOTES.md): XLA interleaves the subject
        model and the FM tower ~1.3× better than two back-to-back programs,
        on top of saving one dispatch per batch. Memoized per ``embed_fn``
        object — callers must reuse a stable function object or eat a
        recompile.
        """
        key = (id(embed_fn), interventions_fingerprint())
        if key in self._fused_steps:
            return self._cache_hit(self._fused_steps, key)

        if self.mesh is None or self.gspmd:
            # (states replicated, embeddings batch-sharded) in GSPMD mode —
            # see _get_step for why the state layout is pinned.
            out_shardings = (
                (NamedSharding(self.mesh, P()), NamedSharding(self.mesh, P("data")))
                if self.gspmd
                else None
            )

            @functools.partial(jax.jit, donate_argnums=0, out_shardings=out_shardings)
            def step(states, params, embed_params, images, start, n_total):
                b = images.shape[0]
                sample_ids = start + jnp.arange(b, dtype=jnp.int32)
                valid = sample_ids < n_total
                new_states = self._local_step(states, params, images, sample_ids, valid)
                return new_states, embed_fn(embed_params, images)

        else:
            mesh = self.mesh

            def sharded(states, params, embed_params, images, start, n_total):
                local = jax.tree.map(lambda a: a[0], states)
                b_local = images.shape[0]
                shard = jax.lax.axis_index("data").astype(jnp.int32)
                sample_ids = start + shard * b_local + jnp.arange(b_local, dtype=jnp.int32)
                valid = sample_ids < n_total
                new_local = self._local_step(local, params, images, sample_ids, valid)
                emb = embed_fn(embed_params, images)
                return jax.tree.map(lambda a: a[None], new_local), emb

            step = jax.jit(
                jax.shard_map(
                    sharded,
                    mesh=mesh,
                    in_specs=(P("data"), P(), P(), P("data"), P(), P()),
                    out_specs=(P("data"), P("data")),
                    check_vma=False,
                ),
                donate_argnums=0,
            )

        return self._cache_step(self._fused_steps, key, step)

    def _init_states(self, n_latents: dict[str, int]):
        if self.mesh is None:
            return {name: init_topk(c, self.n_collect) for name, c in n_latents.items()}
        if self.gspmd:  # single global (C, k) state, replicated over the mesh
            rep = NamedSharding(self.mesh, P())
            return {
                name: TopKState(
                    values=jax.device_put(jnp.zeros((c, self.n_collect), jnp.bfloat16), rep),
                    ids=jax.device_put(jnp.full((c, self.n_collect), -1, jnp.int32), rep),
                )
                for name, c in n_latents.items()
            }
        sharding = NamedSharding(self.mesh, P("data"))
        return {
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

    def _finalize(self, states):
        if self.mesh is not None and not self.gspmd:
            merge = jax.jit(topk_merge)
            states = {name: merge(st) for name, st in states.items()}
        return states

    def _batches(self, dataset, batch_size: int, prefetch: int, start_index: int = 0):
        sharding = NamedSharding(self.mesh, P("data")) if self.mesh is not None else None
        return device_prefetch_batches(
            iter_batches(dataset, batch_size, start_index=start_index),
            depth=prefetch,
            sharding=sharding,
        )

    # ------------------------------------------------------------ checkpoints
    def save_checkpoint(self, directory, states, next_start: int):
        """Flush the running top-k state mid-sweep (crp's ``checkpoint=500``
        analogue, reference relevance_based.py:157,194 — enables resume after
        interruption)."""
        import json

        import ml_dtypes
        from safetensors.numpy import save_file

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        for name, st in states.items():
            # host_c_array: TPU layouts can materialize F-ordered, which
            # safetensors would serialize transposed.
            save_file(
                {
                    "values": host_c_array(st.values, ml_dtypes.bfloat16),
                    "ids": host_c_array(st.ids, np.int32),
                },
                str(directory / f"state-{name}.safetensors"),
            )
        (directory / "progress.json").write_text(
            json.dumps({"next_start": int(next_start), "layers": list(states)})
        )

    def load_checkpoint(self, directory):
        """Returns (states, next_start) or None if no checkpoint exists."""
        import json

        from safetensors.numpy import load_file

        directory = Path(directory)
        progress = directory / "progress.json"
        if not progress.exists():
            return None
        meta = json.loads(progress.read_text())
        states = {}
        for name in meta["layers"]:
            t = load_file(str(directory / f"state-{name}.safetensors"))
            values = jnp.asarray(t["values"])
            ids = jnp.asarray(t["ids"])
            if self.mesh is not None:
                sharding = NamedSharding(
                    self.mesh, P() if self.gspmd else P("data")
                )
                values = jax.device_put(values, sharding)
                ids = jax.device_put(ids, sharding)
            states[name] = TopKState(values=values, ids=ids)
        return states, int(meta["next_start"])

    @staticmethod
    def _store_embed_chunk(directory, row_start: int, chunk: np.ndarray) -> None:
        """Persist embedding rows [row_start, row_start + len(chunk))."""
        from safetensors.numpy import save_file

        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)
        save_file(
            {"embeds": np.ascontiguousarray(chunk, dtype=np.float32)},
            str(directory / f"embeds-{row_start:012d}.safetensors"),
        )

    @staticmethod
    def _load_embed_chunks(directory, n_rows: int) -> list[np.ndarray]:
        """Load persisted embedding chunks covering exactly [0, n_rows).

        Chunks are written before ``progress.json`` commits ``next_start``, so
        contiguous coverage up to ``n_rows`` must exist; a gap means the
        directory was tampered with or mixes sweeps. Rows BEYOND ``n_rows``
        are dropped: a crash between a chunk write and its progress commit
        leaves a stale trailing chunk whose samples the resumed sweep
        recomputes — keeping it would duplicate those rows in the final table.
        """
        from safetensors.numpy import load_file

        directory = Path(directory)
        chunks, covered = [], 0
        for fpath in sorted(directory.glob("embeds-*.safetensors")):
            if covered >= n_rows:
                logger.warning("dropping uncommitted embedding chunk %s (rows >= %d)", fpath.name, n_rows)
                break
            row_start = int(fpath.stem.split("-")[1])
            if row_start != covered:
                raise RuntimeError(
                    f"embedding checkpoint gap: expected rows from {covered}, "
                    f"found {fpath.name} in {directory}"
                )
            chunk = load_file(str(fpath))["embeds"]
            if covered + chunk.shape[0] > n_rows:
                logger.warning(
                    "truncating embedding chunk %s to the committed row count %d",
                    fpath.name,
                    n_rows,
                )
                chunk = chunk[: n_rows - covered]
            chunks.append(chunk)
            covered += chunk.shape[0]
        if covered < n_rows:
            raise RuntimeError(
                f"embedding checkpoint covers {covered} rows but progress says "
                f"{n_rows} were collected ({directory})"
            )
        return chunks

    @staticmethod
    def clear_checkpoint(directory) -> None:
        """Remove a finished sweep's checkpoint artifacts (state + embeds)."""
        directory = Path(directory)
        if not directory.is_dir():
            return
        for fpath in list(directory.glob("state-*.safetensors")) + list(
            directory.glob("embeds-*.safetensors")
        ):
            fpath.unlink(missing_ok=True)
        (directory / "progress.json").unlink(missing_ok=True)
        try:
            directory.rmdir()
        except OSError:
            pass  # non-checkpoint files present — leave the directory

    def _probe_shape(self, dataset, batch_size):
        fast = getattr(dataset, "images", None)
        probe = np.asarray(fast[0]) if fast is not None else get_image(dataset, 0)
        return (batch_size, *probe.shape), probe.dtype

    def _check_batch(self, batch_size):
        if batch_size % self.n_shards:
            raise ValueError(
                f"batch_size {batch_size} must be divisible by data-parallel degree {self.n_shards}"
            )

    @staticmethod
    def _check_id_range(n: int, id_offset: int):
        """Sample ids are int32 on-device (ops/topk.py); ids ≥ 2^31 would
        silently wrap. The on-disk format is int64 (cast on store), so the
        cap is about the in-flight sweep, not the cache."""
        if id_offset + n > np.iinfo(np.int32).max:
            raise ValueError(
                f"dataset of {n} samples at id offset {id_offset} exceeds the "
                f"int32 sample-id range ({np.iinfo(np.int32).max}); split the "
                "sweep into sub-2^31 shards (multi-host id_offset keeps ids global)"
            )

    # -------------------------------------------------------------------- run
    def run(
        self,
        params,
        dataset,
        batch_size: int,
        *,
        prefetch: int = 2,
        checkpoint_dir=None,
        checkpoint_every: int = 0,
        id_offset: int = 0,
    ):
        """Stream the dataset; returns ``{layer: TopKState}`` globally merged,
        plus the number of samples seen.

        With ``checkpoint_dir`` + ``checkpoint_every`` (batches), the running
        state flushes periodically and an interrupted sweep resumes from the
        last flush.

        ``id_offset`` shifts the recorded sample ids — a multi-host sweep
        feeds each host its :class:`~semanticlens_tpu.data.dataset.Subset`
        shard with ``id_offset=shard_start`` so ids stay global dataset
        indices (see :mod:`semanticlens_tpu.parallel.multihost`).
        """
        n = len(dataset)
        if n == 0:
            return {name: init_topk(1, self.n_collect) for name in self.layer_names}, 0
        self._check_batch(batch_size)
        self._check_id_range(n, id_offset)

        resume_start = 0
        states = None
        if checkpoint_dir is not None:
            loaded = self.load_checkpoint(checkpoint_dir)
            if loaded is not None:
                states, resume_start = loaded
                logger.info(f"Resuming collect sweep from sample {resume_start}")

        if states is None:
            shape, dtype = self._probe_shape(dataset, batch_size)
            n_latents = self.infer_n_latents(params, shape, dtype)
            states = self._init_states(n_latents)
        step = self._get_step()

        batches_done = 0
        for images, start_index, _ in self._batches(dataset, batch_size, prefetch, resume_start):
            states = step(
                states, params, images, np.int32(start_index + id_offset), np.int32(n + id_offset)
            )
            batches_done += 1
            if checkpoint_dir is not None and checkpoint_every and batches_done % checkpoint_every == 0:
                self.save_checkpoint(checkpoint_dir, states, start_index + batch_size)

        return self._finalize(states), n

    def run_fused(
        self,
        params,
        dataset,
        batch_size: int,
        embed_fn: Callable,
        *,
        embed_params=None,
        prefetch: int = 2,
        checkpoint_dir=None,
        checkpoint_every: int = 0,
        id_offset: int = 0,
        embed_flush_mb: float = 512.0,
    ):
        """Single-pass Collect + Embed: one upload per image feeds both.

        ``id_offset`` shifts recorded sample ids exactly as in :meth:`run`
        (multi-host shards keep global dataset indices; embedding rows stay
        shard-local — row r embeds dataset sample ``id_offset + r``).

        Two embed contracts:

        - ``embed_params=None`` (legacy): ``embed_fn(raw_device_batch) ->
          (B, D)`` runs as its own dispatch after each collect step;
        - ``embed_params`` given: ``embed_fn(embed_params, raw_device_batch)
          -> (B, D)`` must be traceable and BOTH networks compile into one
          XLA program per batch (``_get_fused_step`` — measured ~1.3× over
          separate programs on v5e). Pass a stable ``embed_fn`` object to
          reuse the compiled step across sweeps.

        Returns ``({layer: TopKState}, embeds (N, D) float32 numpy, n)``.
        Embeddings accumulate on device only up to ``embed_flush_mb`` (then
        drain to host regardless of checkpointing) — an arbitrarily long
        sweep is HBM-bounded: a 10M-sample × 512-d sweep holds at most the
        flush budget + one batch on device instead of ~20 GB.

        With ``checkpoint_dir`` + ``checkpoint_every`` (batches), both halves
        of the sweep persist periodically — the running top-k states AND the
        embedding rows produced so far — and an interrupted sweep resumes from
        the last flush with bit-identical final output (tested). Embedding
        chunks are written before ``progress.json`` commits the new
        ``next_start``, so a crash between the two just re-does one flush
        interval. Reference analogue: cache-as-resume
        (activation_based.py:331-339) + crp's ``checkpoint=500``.
        """
        n = len(dataset)
        if n == 0:
            return (
                {name: init_topk(1, self.n_collect) for name in self.layer_names},
                np.zeros((0, 1), np.float32),
                0,
            )
        self._check_batch(batch_size)
        self._check_id_range(n, id_offset)

        resume_start = 0
        states = None
        host_chunks: list[np.ndarray] = []
        if checkpoint_dir is not None:
            loaded = self.load_checkpoint(checkpoint_dir)
            if loaded is not None:
                states, resume_start = loaded
                host_chunks = self._load_embed_chunks(checkpoint_dir, resume_start)
                logger.info(f"Resuming fused sweep from sample {resume_start}")

        if states is None:
            shape, dtype = self._probe_shape(dataset, batch_size)
            n_latents = self.infer_n_latents(params, shape, dtype)
            states = self._init_states(n_latents)
        if embed_params is not None:
            fused_step = self._get_fused_step(embed_fn)
        else:
            step = self._get_step()

        pending = []  # device-resident embed chunks awaiting a host drain
        pending_bytes = 0
        flush_bytes = int(embed_flush_mb * 2**20)
        since_ckpt: list[np.ndarray] = []  # host rows since last checkpoint commit
        flushed_rows = resume_start
        batches_done = 0

        def drain_pending():
            # device → host; bounds HBM residency independent of checkpointing
            nonlocal pending, pending_bytes
            if pending:
                since_ckpt.append(np.asarray(jnp.concatenate(pending, axis=0), np.float32))
                pending, pending_bytes = [], 0

        for images, start_index, _ in self._batches(dataset, batch_size, prefetch, resume_start):
            if embed_params is not None:
                states, emb = fused_step(
                    states,
                    params,
                    embed_params,
                    images,
                    np.int32(start_index + id_offset),
                    np.int32(n + id_offset),
                )
            else:
                states = step(
                    states, params, images, np.int32(start_index + id_offset), np.int32(n + id_offset)
                )
                emb = embed_fn(images)
            pending.append(emb)
            pending_bytes += emb.nbytes
            if pending_bytes >= flush_bytes:
                drain_pending()
            batches_done += 1
            if checkpoint_dir is not None and checkpoint_every and batches_done % checkpoint_every == 0:
                drain_pending()
                chunk = np.concatenate(since_ckpt, axis=0)
                self._store_embed_chunk(checkpoint_dir, flushed_rows, chunk)
                host_chunks.append(chunk)
                since_ckpt.clear()
                flushed_rows = start_index + batch_size
                self.save_checkpoint(checkpoint_dir, states, flushed_rows)

        drain_pending()
        host_chunks.extend(since_ckpt)
        embeds = np.concatenate(host_chunks, axis=0)[:n]
        return self._finalize(states), embeds, n

