"""Relevance-based component visualizer: attribution-selected concept examples.

Implements the *capability* of the reference's ``RelevanceComponentVisualizer``
(reference: semanticlens/component_visualization/relevance_based.py:30-333 —
a crp/zennit wrapper, marked broken there at line 27) natively:

- the Collect sweep reuses the fused streaming engine in activation mode
  (crp's ``max_target="sum"`` ≙ spatial-sum aggregation);
- ``get_max_reference`` computes ε-plus-flat LRP heatmaps with JAX custom
  VJPs (:mod:`semanticlens_tpu.relevance.attribution`) and returns
  attribution-cropped/masked reference images
  (:func:`semanticlens_tpu.utils.render.crop_and_mask_images` by default);
- unlike the reference, ``_compute_concept_db`` IS implemented: concept
  examples are embedded after attribution cropping, so the concept DB
  reflects the component's receptive evidence rather than whole images
  (benchmark config 4).
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.collect.activation_caching import ActMaxCache
from semanticlens_tpu.collect.base import AbstractComponentVisualizer
from semanticlens_tpu.collect.engine import CollectEngine
from semanticlens_tpu.data.dataset import get_image
from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.ops import aggregators
from semanticlens_tpu.relevance.attribution import (
    make_attribution_fn,
    make_batched_attribution_fn,
)
from semanticlens_tpu.utils.helper import get_fallback_name
from semanticlens_tpu.utils.render import crop_and_mask_images

logger = logging.getLogger(__name__)

# Rank-dispatching reducers: the relevance CV serves conv (4D) AND
# transformer (3D) taps with the same max_target names.
_AGG_BY_NAME = {
    "sum": aggregators.aggregate_sum_auto,
    "mean": aggregators.aggregate_mean_auto,
    "max": aggregators.aggregate_max_auto,
}


class RelevanceComponentVisualizer(AbstractComponentVisualizer):
    """Finds and renders concept examples with relevance attribution.

    Parameters
    ----------
    model : SubjectModel (weights via ``params`` or ``model.params``).
    dataset : raw-image dataset (uint8/float HWC); also used for rendering.
    layer_names : str or list of taps to analyze.
    preprocess_fn : optional device-side input preprocessing for the model.
    composite : LRP composite ("epsilon_plus_flat", "epsilon", "gradient").
    aggregation_fn : activation target reducer name ("sum" | "mean" | "max").
    abs_norm : normalize heatmaps per image by their abs max.
    storage_dir : cache root (crp-style single dir; reference
        relevance_based.py:113 uses "FeatureVisualization").
    num_samples : top examples kept per component.
    plot_fn : heatmap renderer (default: square crop).
    """

    def __init__(
        self,
        model,
        dataset,
        layer_names,
        preprocess_fn=None,
        composite: str = "epsilon_plus_flat",
        aggregation_fn: str = "sum",
        abs_norm: bool = True,
        storage_dir: str | Path = "FeatureVisualization",
        device=None,
        num_samples: int = 100,
        cache=None,
        plot_fn=crop_and_mask_images,
        params=None,
        mesh=None,
    ):
        layer_names = [layer_names] if not isinstance(layer_names, list) else layer_names
        self.model = model
        self.params = params if params is not None else getattr(model, "params", None)
        if self.params is None:
            raise ValueError("Model weights required: pass `params=` or set `model.params`.")
        self.dataset = dataset
        self.layer_names = list(layer_names)
        validate_layers(self.model, self.layer_names)
        from semanticlens_tpu.models.torch_adapter import TorchSubjectModel

        if isinstance(model, TorchSubjectModel):
            raise TypeError(
                "RelevanceComponentVisualizer needs JAX autodiff through the "
                "subject model; TorchSubjectModel forwards run behind a host "
                "callback with no VJP. Use a native family (models.ResNet/"
                "VisionTransformer/...) for attribution-based collection."
            )

        self.preprocess_fn = preprocess_fn
        self.composite = composite
        self.aggregation_fn = aggregation_fn
        self.abs_norm = abs_norm
        self._storage_dir = Path(storage_dir)
        self.num_samples = num_samples
        self.plot_fn = plot_fn
        self.mesh = mesh

        if not hasattr(self.model, "name"):
            self.model.name = get_fallback_name(self.model)
        if not hasattr(self.dataset, "name"):
            self.dataset.name = get_fallback_name(self.dataset)

        try:
            agg = _AGG_BY_NAME[aggregation_fn]
        except KeyError:
            raise ValueError(
                f"Unknown aggregation_fn '{aggregation_fn}'; expected one of {sorted(_AGG_BY_NAME)}"
            )
        self.actmax_cache = ActMaxCache(self.layer_names, n_collect=num_samples, aggregation_fn=agg)
        self.engine = CollectEngine(
            model=self.model,
            layer_names=self.layer_names,
            aggregation_fn=agg,
            n_collect=num_samples,
            mesh=mesh,
            input_preprocess=preprocess_fn,
        )
        self._attribution_fns: dict[str, object] = {}
        self._ran = False
        if self.check_if_preprocessed():
            try:
                self.actmax_cache.load(self.storage_dir)
                self._ran = True
            except FileNotFoundError:
                # Stale cache written with different num_samples/aggregation —
                # recompute on run() rather than failing construction.
                logger.info("Existing cache at %s does not match this configuration; "
                            "will recompute on run().", self.storage_dir)

    # ------------------------------------------------------------- properties
    @property
    def caching(self) -> bool:
        return True

    @property
    def storage_dir(self) -> Path:
        return self._storage_dir / self.dataset.name / self.model.name

    @property
    def metadata(self) -> dict:
        return {
            "preprocess_fn": str(self.preprocess_fn),
            "abs_norm": str(self.abs_norm),
            "aggregation_fn": self.aggregation_fn,
            "composite": self.composite,
            "num_samples": str(self.num_samples),
            "plot_fn": getattr(self.plot_fn, "__name__", str(self.plot_fn)),
            "layer_names": str(self.layer_names),
            "dataset": self.dataset.name,
            "model": self.model.name,
        }

    # ----------------------------------------------------------------- sweep
    def check_if_preprocessed(self) -> bool:
        """True iff every layer's exact cache file (matching aggregation fn
        and num_samples) exists."""
        d = self.storage_dir
        if not d.is_dir():
            return False
        return all(
            (d / self.actmax_cache._layer_fname(layer)).exists() for layer in self.layer_names
        )

    def run(self, composite=None, data_start=0, data_end=None, batch_size=32, checkpoint=500, **kwargs):
        """Activation-mode sweep: collect per-component top sample ids.

        Returns the per-layer ActMax cache (or the list of existing files if
        already preprocessed — reference relevance_based.py:198-200 contract).
        """
        if self.check_if_preprocessed():
            logger.info("Already preprocessed")
            self.actmax_cache.load(self.storage_dir)
            self._ran = True
            return [
                f.name
                for f in self.storage_dir.iterdir()
                if any(layer in f.name for layer in self.layer_names)
            ]

        data_end = len(self.dataset) if data_end is None else data_end
        # Keyed by slice: a checkpoint from a different (data_start, data_end)
        # sweep holds incompatible slice-local ids and must not be resumed.
        ckpt_dir = (
            self.storage_dir / f"_checkpoint-{data_start}-{data_end}" if checkpoint else None
        )
        states, n_seen = self.engine.run(
            self.params,
            _Slice(self.dataset, data_start, data_end),
            batch_size,
            checkpoint_dir=ckpt_dir,
            checkpoint_every=max(1, checkpoint // batch_size) if checkpoint else 0,
        )
        for name, state in states.items():
            if data_start:
                # Engine ids are slice-local; stored ids must index the FULL
                # dataset (get_max_reference renders from self.dataset).
                state = state._replace(
                    ids=jnp.where(state.ids >= 0, state.ids + data_start, state.ids)
                )
            act_max = self.actmax_cache[name]
            act_max.n_latents = int(state.values.shape[0])
            act_max.state = state
            self.actmax_cache.sample_idx_counter[name] = n_seen
        self.actmax_cache.store(self.storage_dir)
        if ckpt_dir is not None and ckpt_dir.exists():
            import shutil

            shutil.rmtree(ckpt_dir)  # the stored ActMax files supersede it
        self._ran = True
        return self.actmax_cache.cache

    def get_act_max_sample_ids(self, layer_name: str) -> np.ndarray:
        """(n_components, n_samples) top sample ids (reference
        relevance_based.py:283-298)."""
        return self.actmax_cache[layer_name].sample_ids

    # ------------------------------------------------------------ attribution
    def _attribution_fn(self, layer_name: str):
        if layer_name not in self._attribution_fns:
            self._attribution_fns[layer_name] = make_attribution_fn(
                _Preprocessed(self.model, self.preprocess_fn),
                layer_name,
                composite=self.composite,
                aggregation="sum" if self.aggregation_fn == "sum" else "max",
                abs_norm=self.abs_norm,
            )
        return self._attribution_fns[layer_name]

    def _batched_attribution_fn(self, layer_name: str):
        key = f"{layer_name}//batched"
        if key not in self._attribution_fns:
            self._attribution_fns[key] = make_batched_attribution_fn(
                _Preprocessed(self.model, self.preprocess_fn),
                layer_name,
                composite=self.composite,
                aggregation="sum" if self.aggregation_fn == "sum" else "max",
                abs_norm=self.abs_norm,
            )
        return self._attribution_fns[key]

    def get_max_reference(
        self, concept_ids, layer_name: str, n_ref: int | None = None, batch_size: int = 32
    ) -> dict:
        """Attribution-cropped reference images per concept.

        Returns ``{concept_id: [PIL.Image, ...]}`` — the reference's
        get_max_reference contract (relevance_based.py:202-246), computed
        with JAX LRP instead of crp/zennit.

        Dispatch economics: K = max(1, batch_size // n_ref) components are
        attributed per XLA program (each over its own top images, vmapped),
        so a whole layer costs ⌈C/K⌉ dispatches instead of C. Components with
        fewer than ``n_ref`` collected samples are padded in-program (repeat
        of their first image) and trimmed on host; fully-empty components are
        excluded from device work entirely.
        """
        if not self._ran:
            raise RuntimeError("Call run() first to collect maximally activating samples.")
        if isinstance(concept_ids, (int, np.integer)):
            concept_ids = [int(concept_ids)]
        n_ref = n_ref or min(self.num_samples, 8)

        ids_table = self.get_act_max_sample_ids(layer_name)
        per_cid_ids = {
            int(cid): [int(i) for i in ids_table[int(cid)][:n_ref] if i >= 0]
            for cid in concept_ids
        }
        out = {cid: [] for cid in per_cid_ids}
        work = [(cid, ids) for cid, ids in per_cid_ids.items() if ids]
        if not work:
            return out

        # Cap at 32: measured on v5e, K=32 is ~9% over K=16 but K=64 exceeds
        # the backend's program-size limits (remote compile failure) — see
        # docs/PERF_NOTES.md.
        k_per_program = max(1, min(32, batch_size // n_ref))
        if k_per_program == 1:
            fn = self._attribution_fn(layer_name)
            for cid, ids in work:
                raw = np.stack([get_image(self.dataset, i) for i in ids])
                heat = np.asarray(fn(self.params, jnp.asarray(raw), jnp.int32(cid)))
                out[cid] = self.plot_fn(raw, heat)
            return out

        fn = self._batched_attribution_fn(layer_name)
        for chunk_start in range(0, len(work), k_per_program):
            chunk = work[chunk_start : chunk_start + k_per_program]
            # Static shapes: pad the component axis by repeating the last
            # entry and each image axis by repeating the first image.
            padded = chunk + [chunk[-1]] * (k_per_program - len(chunk))
            raws, comps = [], []
            for cid, ids in padded:
                imgs = [get_image(self.dataset, i) for i in ids]
                imgs += [imgs[0]] * (n_ref - len(imgs))
                raws.append(np.stack(imgs))
                comps.append(cid)
            heat = np.asarray(
                fn(self.params, jnp.asarray(np.stack(raws)), jnp.asarray(comps, np.int32))
            )
            for row, (cid, ids) in enumerate(chunk):
                n_valid = len(ids)
                out[cid] = self.plot_fn(raws[row][:n_valid], heat[row][:n_valid])
        return out

    # ------------------------------------------------------------ concept DB
    def _compute_concept_db(self, fm, batch_size: int = 32, n_ref: int | None = None, **kwargs):
        """Embed attribution-cropped top examples per component.

        Capability upgrade over the reference (which leaves this abstract for
        the relevance CV): each component's concept vectors come from its
        attribution-cropped evidence.
        """
        if not self._ran:
            self.run(batch_size=batch_size)
        n_ref = n_ref or self.num_samples

        concept_db = {}
        for layer_name in self.layer_names:
            ids_table = self.get_act_max_sample_ids(layer_name)
            n_components = ids_table.shape[0]
            refs = self.get_max_reference(list(range(n_components)), layer_name, n_ref, batch_size)

            # Encode ALL components' crops in flat fixed-size batches — one
            # dispatch per batch_size crops rather than one per component
            # (constant program shape, so no recompiles on ragged tails).
            flat: list = []
            spans: dict[int, tuple[int, int]] = {}
            for cid, pils in refs.items():
                spans[cid] = (len(flat), len(flat) + len(pils))
                flat.extend(pils)
            encoded_rows = None
            if flat:
                chunks = []
                for s in range(0, len(flat), batch_size):
                    chunk = flat[s : s + batch_size]
                    chunk = chunk + [chunk[0]] * (batch_size - len(chunk))  # static shape
                    chunks.append(np.asarray(fm.encode_image(fm.preprocess(chunk)), np.float32))
                encoded_rows = np.concatenate(chunks, axis=0)[: len(flat)]
            embed_dim = encoded_rows.shape[-1] if encoded_rows is not None else 1
            embeds = []
            for cid in range(n_components):
                lo, hi = spans.get(cid, (0, 0))
                e = encoded_rows[lo:hi] if hi > lo else np.zeros((0, embed_dim), np.float32)
                if e.shape[0] < n_ref:  # pad unfilled slots with zeros
                    e = np.concatenate([e, np.zeros((n_ref - e.shape[0], embed_dim), np.float32)])
                embeds.append(e)
            concept_db[layer_name] = np.stack(embeds)
        return concept_db

    def to(self, device):
        return self


class _Slice:
    """View of dataset[start:end] preserving the fast-array path."""

    def __init__(self, dataset, start, end):
        self.dataset = dataset
        self.start = start
        self.end = min(end, len(dataset))
        base = getattr(dataset, "images", None)
        if base is not None:
            self.images = base[self.start : self.end]
        if hasattr(dataset, "name"):
            self.name = dataset.name

    def __len__(self):
        return self.end - self.start

    def __getitem__(self, idx):
        return self.dataset[self.start + idx]


class _Preprocessed:
    """Model view that applies the input preprocessing before ``apply``."""

    def __init__(self, model, preprocess_fn):
        self.model = model
        self.preprocess_fn = preprocess_fn

    def apply(self, params, x, tap_names=()):
        if self.preprocess_fn is not None:
            x = self.preprocess_fn(x)
        return self.model.apply(params, x, tap_names)

