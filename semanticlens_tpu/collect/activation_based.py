"""Activation-based component visualizer — the main Collect engine.

TPU-native redesign of the reference ``ActivationComponentVisualizer``
(reference: semanticlens/component_visualization/activation_based.py:41-560):

- PyTorch forward hooks → functional **taps** (models return activations);
- host-side per-batch top-k → donated on-device :class:`TopKState` carried
  through a fused jit step (:class:`~semanticlens_tpu.collect.engine.CollectEngine`);
- torch DataLoader → padded static-shape batches with background prefetch;
- optional multi-chip data parallelism via a ``jax.sharding.Mesh``.

The public API, cache directory layout, and on-disk artifact format are kept
identical so reference users can switch without changing call sites or
invalidating caches.
"""

from __future__ import annotations

import logging
import math
import warnings
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.collect.activation_caching import ActMaxCache
from semanticlens_tpu.collect.base import AbstractComponentVisualizer
from semanticlens_tpu.collect.engine import CollectEngine
from semanticlens_tpu.data.dataset import _extract_image, iter_batches, prefetch_batches
from semanticlens_tpu.models.base import SubjectModel, validate_layers
from semanticlens_tpu.ops import aggregators
from semanticlens_tpu.utils.helper import get_fallback_name

logger = logging.getLogger(__name__)


class MissingNameWarning(UserWarning):
    """Raised when a model/dataset lacks the ``.name`` needed for stable caching."""


class ActivationComponentVisualizer(AbstractComponentVisualizer):
    """Finds concept examples by activation maximization over a dataset.

    Parameters
    ----------
    model : SubjectModel
        Functional subject model. Weights come from ``params`` or
        ``model.params``. A ``.name`` attribute is recommended for caching.
    dataset_model : dataset preprocessed for the subject model (float NHWC).
    dataset_fm : dataset yielding raw images for the foundation model's own
        preprocessing; must match ``dataset_model`` in length and order.
    layer_names : taps to analyze (torch-style names, e.g. ``"layer4.1.conv2"``).
    num_samples : top-k examples kept per component.
    aggregate_fn : activation reducer; defaults to spatial mean
        (:func:`~semanticlens_tpu.ops.aggregators.aggregate_conv_mean`).
    cache_dir : root for cached artifacts; None disables caching.
    mesh : optional ``jax.sharding.Mesh`` with a ``"data"`` axis.
    params : optional explicit parameter pytree.
    model_preprocess : optional device-side fn mapping a raw batch (e.g.
        uint8 HWC) to the subject model's input. Enables uint8 transport +
        on-device normalization; defaults to a float32 cast.

    Notes
    -----
    When ``dataset_model is dataset_fm`` (one raw-image dataset serving both
    models — the TPU-native layout), ``_compute_concept_db`` runs a **fused
    single pass**: every batch is uploaded once and feeds the subject model
    and the foundation model. The reference sweeps the dataset twice
    (activation_based.py:341-358, then 392-433); at TPU host→device
    bandwidths the second sweep is pure waste.
    """

    AGGREGATION_DEFAULTS = {
        "mean": aggregators.aggregate_conv_mean,
        "max": aggregators.aggregate_conv_max,
    }

    def __init__(
        self,
        model: SubjectModel,
        dataset_model,
        dataset_fm,
        layer_names: list[str],
        num_samples: int,
        device=None,
        aggregate_fn=None,
        cache_dir: str | None = None,
        mesh=None,
        params=None,
        model_preprocess=None,
    ):
        self.model = model
        self.params = params if params is not None else getattr(model, "params", None)
        if self.params is None:
            raise ValueError(
                "Model weights required: pass `params=` or set `model.params`."
            )
        self.dataset = dataset_model
        self.dataset_fm = dataset_fm
        self.mesh = mesh
        self._init_cache_dir(cache_dir)
        self._validate_args()

        self.layer_names = list(layer_names)
        validate_layers(self.model, self.layer_names)

        if aggregate_fn is None:
            logger.warning(
                f"No aggregation_fn provided using default: {aggregators.aggregate_conv_mean.__name__}"
            )
            aggregate_fn = aggregators.aggregate_conv_mean

        self.actmax_cache = ActMaxCache(
            self.layer_names, n_collect=num_samples, aggregation_fn=aggregate_fn
        )
        self.engine = CollectEngine(
            model=self.model,
            layer_names=self.layer_names,
            aggregation_fn=aggregate_fn,
            n_collect=num_samples,
            mesh=mesh,
            input_preprocess=model_preprocess,
        )

        if self.caching:
            try:
                self.actmax_cache.load(self.storage_dir)
                logger.info(f"Results loaded from {self.storage_dir}")
            except FileNotFoundError:
                logger.info(f"Results will be stored in {self.storage_dir}")

    # ------------------------------------------------------------- validation
    def _validate_args(self):
        """Stable names are required for cache identity; fall back to
        sha256-of-repr with a warning (reference activation_based.py:187-215)."""
        if not hasattr(self.model, "name"):
            model_name = get_fallback_name(self.model)
            if self.caching:
                warnings.warn(
                    f"Model does not have a name attribute, which is required for reliable caching.\n"
                    f"Using a fallback name: {model_name}.",
                    MissingNameWarning,
                    stacklevel=2,
                )
            self.model.name = model_name
        if not hasattr(self.dataset, "name"):
            dataset_name = get_fallback_name(self.dataset)
            if self.caching:
                warnings.warn(
                    f"Dataset does not have a name attribute, which is required for reliable caching.\n"
                    f"Using a fallback name: {dataset_name}.",
                    MissingNameWarning,
                    stacklevel=2,
                )
            self.dataset.name = dataset_name

        if len(self.dataset) != len(self.dataset_fm):
            raise ValueError(
                "Model and foundation model datasets should have the same length.",
                (len(self.dataset), len(self.dataset_fm)),
            )

    def _init_cache_dir(self, cache_dir):
        if cache_dir is None:
            logger.warning("No cache dir provided. Results will not be cached!")
            self._cache_root = None
        else:
            self._cache_root = Path(cache_dir)
            self._cache_root.mkdir(parents=True, exist_ok=True)

    # -------------------------------------------------------------- properties
    @property
    def caching(self) -> bool:
        return self._cache_root is not None

    @property
    def storage_dir(self) -> Path:
        """``{cache_root}/ActivationComponentVisualizer/{dataset}/{model}`` —
        identical derivation to reference activation_based.py:279-295."""
        assert self._cache_root, "No cache dir provided"
        return self._cache_root / self.__class__.__name__ / self.dataset.name / self.model.name

    @property
    def metadata(self) -> dict[str, str]:
        return {**self.actmax_cache.metadata, "dataset": self.dataset.name, "model": self.model.name}

    @property
    def embedding_table(self) -> np.ndarray | None:
        """(N, D) full-dataset FM embedding table from the last concept-DB
        computation, or None before one ran. Feeds evidence-based analyses
        (``label_components(scoring="wpmi")``)."""
        return getattr(self, "_embedding_table", None)

    # --------------------------------------------------------------- pipeline
    def run(self, batch_size: int = 32, **kwargs):
        """Collect per-component top activating samples (cache-or-compute).

        Returns ``{layer: ActMax}``, loading from the safetensors cache when
        a valid one exists (reference activation_based.py:309-339).
        """
        checkpoint = kwargs.get("checkpoint", 512)
        if self._cache_root is None:
            logger.debug("No cache root provided, running computation...")
            return self._run(batch_size=batch_size, checkpoint=checkpoint)
        try:
            self.actmax_cache.load(self.storage_dir)
            return self.actmax_cache.cache
        except FileNotFoundError:
            logger.debug(
                f"Activation maximization cache not found at {self.storage_dir}. Running computation..."
            )
            return self._run(batch_size=batch_size, checkpoint=checkpoint)

    def _run(self, batch_size: int = 64, checkpoint: int = 512):
        ckpt_dir = (
            self.storage_dir / "_checkpoint-collect"
            if (checkpoint and self._cache_root is not None)
            else None
        )
        states, n_seen = self.engine.run(
            self.params,
            self.dataset,
            batch_size,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=max(1, checkpoint // batch_size) if ckpt_dir else 0,
        )
        for name, state in states.items():
            act_max = self.actmax_cache[name]
            act_max.n_latents = int(state.values.shape[0])
            act_max.state = state
            self.actmax_cache.sample_idx_counter[name] = n_seen
        if self._cache_root:
            self.actmax_cache.store(self.storage_dir)
            logger.debug(f"Stored activation maximization cache at {self.storage_dir}")
        if ckpt_dir is not None:
            self.engine.clear_checkpoint(ckpt_dir)
        return self.actmax_cache.cache

    def _compute_concept_db(self, fm, batch_size: int = 32, checkpoint: int = 512, **kwargs):
        """Collect, embed the full FM dataset, gather per-component embeddings.

        Embed-all-then-gather matches the reference semantics and cache shape
        (reference activation_based.py:360-390): deduplication across
        components comes for free. The gather happens on the host — the full
        (n_components, k, D) concept DB is ~50× the size of the (N, D)
        embedding table, so only the table crosses the device→host link.

        When the collect cache is cold and both stages read the same raw
        dataset, Collect and Embed run as one fused pass (one upload per
        image).
        """
        if self.dataset_fm is self.dataset and not self._has_collect_cache():
            embeds = self._run_fused(fm, batch_size, checkpoint=checkpoint)
        else:
            self.run(batch_size=batch_size, checkpoint=checkpoint, **kwargs)
            embeds = self._embed_vision_dataset(fm, batch_size, checkpoint=checkpoint, **kwargs)
        # Retained for evidence-based analyses (WPMI labeling needs the full
        # (N, D) table, ~2% the size of the gathered concept DB).
        self._embedding_table = embeds
        concept_db = {}
        for layer_name in self.layer_names:
            ids = self.get_max_reference(layer_name)
            db = embeds[ids]
            # −1 sentinels (never-filled top-k slots, e.g. dead latents or
            # num_samples > len(dataset)) become ZERO rows. The reference
            # fancy-indexes the last image's embedding here (reference
            # activation_based.py:389, an out-of-bounds-gather accident);
            # zeros are deliberate divergence, matching the multi-host path
            # (parallel/multihost.py) and the relevance CV's zero-padding so
            # concept DBs are identical across topologies.
            db[ids < 0] = 0.0
            concept_db[layer_name] = db
        return concept_db

    def _has_collect_cache(self) -> bool:
        if self._cache_root is None:
            return False
        return all(
            (self.storage_dir / self.actmax_cache._layer_fname(name)).exists()
            for name in self.layer_names
        )

    def _run_fused(self, fm, batch_size: int, checkpoint: int = 0) -> np.ndarray:
        """One pass over the raw dataset: collect top-k AND embed every image.

        ``checkpoint`` (samples between flushes, crp-style) makes the sweep
        crash-safe when a cache root is configured: top-k states and the
        embedding table persist under ``storage_dir/_checkpoint-fused`` and an
        interrupted audit resumes instead of restarting. Cleared on success —
        the actmax + concept-db caches supersede it.

        When the FM exposes its raw pieces (``params`` + ``_encode_image``,
        true for every built-in FM) the collect step and the FM tower compile
        into ONE program per batch (engine ``_get_fused_step``); otherwise
        (e.g. mock FMs) the embed runs as its own dispatch.
        """
        embed_fn, embed_params = self._fused_embed(fm)

        ckpt_dir = (
            self.storage_dir / "_checkpoint-fused"
            if (checkpoint and self._cache_root is not None)
            else None
        )
        states, embeds, n_seen = self.engine.run_fused(
            self.params,
            self.dataset,
            batch_size,
            embed_fn,
            embed_params=embed_params,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=max(1, checkpoint // batch_size) if ckpt_dir else 0,
        )
        self._ingest_fused(states, embeds, n_seen)
        if ckpt_dir is not None:
            # Only after the actmax cache is persisted: clearing first would
            # reopen the crash window between sweep end and cache store.
            self.engine.clear_checkpoint(ckpt_dir)
        return embeds

    def _fused_embed(self, fm):
        """(embed_fn, embed_params) for run_fused, stable across repeat calls.

        The engine memoizes its compiled combined step per embed_fn object,
        so the function is cached per (visualizer, fm) — rebuilding a lambda
        every call would recompile the big fused program each sweep. Keyed by
        fm identity so alternating between FMs on one visualizer reuses each
        FM's compiled step instead of recompiling.
        """
        cache = getattr(self, "_fused_embed_cache", None)
        if cache is None:
            cache = self._fused_embed_cache = {}
        hit = cache.get(id(fm))
        if hit is not None and hit[0] is fm:
            _fm, embed_fn, fused_capable = hit
            # params fetched fresh each sweep — the fm may have loaded new ones
            return embed_fn, (fm.params if fused_capable else None)
        fused_capable = hasattr(fm, "_encode_image") and hasattr(fm, "params")
        if fused_capable:

            def embed_fn(fm_params, raw_device_batch):
                return fm._encode_image(fm_params, fm.preprocess(raw_device_batch))

        else:  # mock/duck-typed FM: opaque per-batch dispatch

            def embed_fn(raw_device_batch):
                return fm.encode_image(fm.preprocess(raw_device_batch))

        cache[id(fm)] = (fm, embed_fn, fused_capable)
        return embed_fn, (fm.params if fused_capable else None)

    def _ingest_fused(self, states, embeds, n_seen):
        for name, state in states.items():
            act_max = self.actmax_cache[name]
            act_max.n_latents = int(state.values.shape[0])
            act_max.state = state
            self.actmax_cache.sample_idx_counter[name] = n_seen
        if self._cache_root:
            self.actmax_cache.store(self.storage_dir)
        assert embeds.shape[0] == n_seen, "Number of embeddings does not match number of ids!"
        return embeds

    def _embed_vision_dataset(self, fm, batch_size: int, checkpoint: int = 512, **kwargs) -> np.ndarray:
        """Embed every sample of ``dataset_fm`` once → (N, D) float32.

        Raw batches upload in host dtype (uint8 stays uint8); embeddings
        accumulate on device and return in a single readback. With a cache
        root configured, finished rows persist every ``checkpoint`` samples
        under ``storage_dir/_checkpoint-embed`` (same chunk format as the
        fused sweep) so an interrupted embed of a large FM dataset resumes
        instead of restarting.
        """
        import json

        n = len(self.dataset_fm)
        ckpt_dir = (
            self.storage_dir / "_checkpoint-embed"
            if (checkpoint and self._cache_root is not None)
            else None
        )
        ckpt_every = max(1, checkpoint // batch_size) if ckpt_dir else 0

        resume_start = 0
        host_chunks: list[np.ndarray] = []
        if ckpt_dir is not None and (ckpt_dir / "progress.json").exists():
            resume_start = int(json.loads((ckpt_dir / "progress.json").read_text())["next_start"])
            host_chunks = self.engine._load_embed_chunks(ckpt_dir, resume_start)
            logger.info(f"Resuming FM embedding sweep from sample {resume_start}")

        pending = []
        flushed_rows = resume_start
        batches_done = 0
        for batch in prefetch_batches(iter_batches(self.dataset_fm, batch_size, start_index=resume_start)):
            inputs = fm.preprocess(jax.device_put(batch.images))
            pending.append(fm.encode_image(inputs))
            batches_done += 1
            if ckpt_every and batches_done % ckpt_every == 0:
                chunk = np.asarray(jnp.concatenate(pending, axis=0), np.float32)
                self.engine._store_embed_chunk(ckpt_dir, flushed_rows, chunk)
                host_chunks.append(chunk)
                pending = []
                flushed_rows = batch.start_index + batch_size
                (ckpt_dir / "progress.json").write_text(json.dumps({"next_start": int(flushed_rows)}))

        if pending:
            host_chunks.append(np.asarray(jnp.concatenate(pending, axis=0), np.float32))
        embeds = np.concatenate(host_chunks, axis=0)[:n]
        if ckpt_dir is not None:
            self.engine.clear_checkpoint(ckpt_dir)
        assert embeds.shape[0] == n, "Number of embeddings does not match number of ids!"
        return embeds

    def get_max_reference(self, layer_name: str) -> np.ndarray:
        """(n_components, n_samples) dataset indices of the top examples."""
        self._check_layer_name(layer_name)
        return self.actmax_cache.cache[layer_name].sample_ids

    # ------------------------------------------------------------------- viz
    def visualize_components(
        self,
        component_ids,
        layer_name: str,
        n_samples: int = 9,
        nrows: int = 3,
        fname=None,
        denormalization_fn=None,
    ):
        """Plot a grid of top activating samples per component.

        Mirrors reference activation_based.py:453-543: grids per component,
        optional dataset ``denormalization_fn``, saved under
        ``storage_dir/plots`` when caching is enabled.
        """
        self._check_layer_name(layer_name)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        post_process = self._resolve_denormalization(denormalization_fn)
        component_ids = np.asarray(component_ids)
        grids = [
            self._component_example_grid(int(c), layer_name, n_samples, nrows, post_process)
            for c in component_ids
        ]

        # Own layout policy: near-square panel arrangement, wide-first
        # (ceil(sqrt) columns), one panel per component.
        n_panels = len(grids)
        n_cols = max(1, math.isqrt(n_panels - 1) + 1) if n_panels else 1
        n_rows = max(1, -(-n_panels // n_cols))
        fig, axs = plt.subplots(n_rows, n_cols, figsize=(3 * n_cols, 3 * n_rows))
        axs = np.atleast_1d(axs).flatten()
        for ax in axs:
            ax.axis("off")
        for ax, cid, grid in zip(axs, component_ids, grids):
            ax.imshow(np.clip(grid, 0, 1) if grid.dtype.kind == "f" else grid)
            ax.set_title(f"Neuron {cid}")

        title = f"{self.model.name} · {layer_name}"
        fig.suptitle((f"{fname} — " if fname else "") + title, fontsize=16)
        fig.tight_layout(rect=[0, 0, 1, 0.96])

        try:
            if not self.caching:
                if fname:
                    logger.warning(
                        "Failed to save visualization. Caching is not enabled in the "
                        "ComponentVisualizer (`cv.caching: False`)"
                    )
                return None
            # Artifact path matches the reference's plots/ naming so existing
            # tooling finds the grids in the same place.
            stem = "-".join(str(int(c)) for c in component_ids)
            fdir = self.storage_dir / "plots"
            fdir.mkdir(parents=True, exist_ok=True)
            fpath = fdir / ((fname + "_" if fname else "") + f"{layer_name}_{stem}.png")
            fig.savefig(fpath)
            logger.info(f"Saved visualization to {fpath}")
            return fpath
        finally:
            plt.close(fig)

    def _resolve_denormalization(self, denormalization_fn):
        """Pick the de-normalizer for raw dataset items (dataset attr wins,
        then the explicit argument, then identity — reference precedence)."""
        ds_fn = getattr(self.dataset, "denormalization_fn", None)
        if ds_fn is not None:
            return ds_fn
        if denormalization_fn is not None:
            return denormalization_fn
        logger.debug("Dataset does not have denormalization_fn method.")
        return lambda x: x

    def _component_example_grid(self, component_id, layer_name, n_samples, nrows, post_process):
        """Tile one component's top-``n_samples`` dataset items into a grid.

        ``post_process`` receives the RAW dataset item (may be a PIL image,
        like the reference's denormalization path) — np conversion after.
        """
        ids = self.get_max_reference(layer_name)[component_id][:n_samples]
        imgs = [np.asarray(post_process(_extract_image(self.dataset[int(i)]))) for i in ids]
        return _make_grid(imgs, nrow=nrows)

    def _check_layer_name(self, layer_name: str):
        if layer_name not in self.layer_names:
            raise ValueError(f"Layer '{layer_name}' not found in model layers: {self.layer_names}")



def _make_grid(imgs: list[np.ndarray], nrow: int = 3) -> np.ndarray:
    """Tile (H, W, C) images into a grid, row-major, ``nrow`` images per row."""
    imgs = [np.atleast_3d(np.asarray(i)) for i in imgs]
    h = max(i.shape[0] for i in imgs)
    w = max(i.shape[1] for i in imgs)
    c = imgs[0].shape[2]
    n = len(imgs)
    ncols = min(nrow, n)
    nrows_ = (n + ncols - 1) // ncols
    grid = np.zeros((nrows_ * h, ncols * w, c), imgs[0].dtype)
    for i, img in enumerate(imgs):
        r, col = divmod(i, ncols)
        grid[r * h : r * h + img.shape[0], col * w : col * w + img.shape[1]] = img
    return grid
