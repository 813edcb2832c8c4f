"""Collect-stage state management and reference-compatible persistence.

``ActMax`` wraps the on-device :class:`~semanticlens_tpu.ops.topk.TopKState`
and persists it as safetensors with the **same byte format, dtypes, metadata,
and filenames** as the reference (bf16 activations, int64 sample ids;
reference: semanticlens/component_visualization/activation_caching.py:64-216,
434-534). A cache written by either implementation loads in the other.

``ActMaxCache`` manages per-layer ``ActMax`` instances. Unlike the reference,
it does not register hooks — JAX models expose activations functionally via
taps — so the update path is a pure function suitable for jit/scan; the
streaming engine lives in
:mod:`semanticlens_tpu.collect.activation_based`.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import ml_dtypes
import numpy as np
from safetensors import safe_open
from safetensors.numpy import save_file as _np_save_file

from semanticlens_tpu.ops import aggregators
from semanticlens_tpu.ops.topk import TopKState, init_topk, topk_update_jit
from semanticlens_tpu.utils.helper import host_c_array

logger = logging.getLogger(__name__)


DEFAULT_AGGREGATION_FUNCTION_MAP = {
    name: fn
    for name, fn in vars(aggregators).items()
    if callable(fn) and name.startswith(("aggregate_", "get_aggregate_"))
}


class ActMax:
    """Running top-k activations and sample ids for one layer.

    Parameters
    ----------
    n_collect : number of top samples kept per component.
    n_latents : number of components; inferred from the first batch if None
        (reference activation_caching.py:93-99 behavior).
    """

    def __init__(self, n_collect: int, n_latents: int | None = None):
        self.n_collect = n_collect
        self.n_latents = n_latents
        self.state: TopKState | None = None
        if n_latents is not None:
            self.state = init_topk(n_latents, n_collect)

    @property
    def is_setup(self) -> bool:
        return self.state is not None

    @property
    def activations(self) -> np.ndarray:
        """(n_latents, n_collect) bf16 numpy copy of the collected values.

        C-contiguity is guaranteed: on TPU backends the device layout can
        materialize F-ordered, which safetensors would serialize transposed
        (see :func:`semanticlens_tpu.utils.helper.host_c_array`).
        """
        assert self.state is not None
        return host_c_array(self.state.values, ml_dtypes.bfloat16)

    @property
    def sample_ids(self) -> np.ndarray:
        """(n_latents, n_collect) int64 sample ids (−1 = unfilled); C-contiguous."""
        assert self.state is not None
        return host_c_array(self.state.ids, np.int64)

    def update(self, acts, sample_ids):
        """Merge a (B, n_latents) batch; infers n_latents on first call."""
        acts = jnp.asarray(acts)
        assert acts.ndim == 2
        if self.state is None:
            self.n_latents = int(acts.shape[1])
            self.state = init_topk(self.n_latents, self.n_collect)
        self.state = topk_update_jit(self.state, acts, jnp.asarray(sample_ids))

    @property
    def alive_latents(self) -> np.ndarray:
        """Indices of latents with any non-zero activation."""
        if self.state is None:
            return np.array([], dtype=np.int64)
        mask = np.abs(self.activations.astype(np.float32)).sum(axis=1) > 0
        return np.where(mask)[0].astype(np.int64)

    def store(self, file_path: str | Path, metadata: dict[str, str] | None = None):
        """Write bf16 values + int64 ids to a reference-format safetensors file."""
        if self.state is None:
            logger.warning("Attempted to store an un-initialized ActMax instance; skipping.")
            return
        tensors = {
            "activations": self.activations,
            "sample_ids": self.sample_ids,
        }
        _np_save_file(tensors, str(file_path), metadata=metadata)
        logger.debug(f"Stored ActMax data to {file_path}")

    @classmethod
    def load(cls, file_path: str | Path) -> "ActMax":
        """Load from a safetensors file written by this or the reference impl."""
        with safe_open(str(file_path), framework="numpy") as f:
            metadata = f.metadata()
            if metadata is None:
                raise ValueError(f"File {file_path} is missing required metadata for loading.")
            tensors = {k: f.get_tensor(k) for k in f.keys()}

        n_collect = int(metadata["n_collect"])
        n_latents = int(metadata["n_latents"])
        instance = cls(n_collect=n_collect, n_latents=n_latents)
        instance.state = TopKState(
            values=jnp.asarray(tensors["activations"].astype(ml_dtypes.bfloat16)),
            ids=jnp.asarray(tensors["sample_ids"].astype(np.int32)),
        )
        return instance


class ActCache:
    """Raw per-layer activation capture for a batch of inputs.

    Functional counterpart of the reference's hook-based ``ActCache``
    (reference activation_caching.py:219-315): instead of registering forward
    hooks, :meth:`capture` runs the tapped forward and stores each requested
    layer's raw output in ``.cache`` (host numpy, mirroring the reference's
    ``.detach().cpu()`` semantics). Use :class:`ActMaxCache` for streaming
    top-k; this class is for ad-hoc inspection of full activations.
    """

    def __init__(self, layer_names: list[str]):
        self.layer_names = list(layer_names)
        self.cache: dict[str, np.ndarray] = {}

    def capture(self, model, params, x) -> dict[str, np.ndarray]:
        """Forward ``x`` through ``model`` and cache the requested taps."""
        _, taps = model.apply(params, x, tuple(self.layer_names))
        self.cache = {name: np.asarray(taps[name], np.float32) for name in self.layer_names}
        return self.cache

    def clear(self):
        self.cache = {}


class ActMaxCache:
    """Per-layer ActMax registry with validating directory persistence.

    Filenames and metadata follow the reference byte-for-byte:
    ``{aggregation_fn_name}-{n_collect}-{layer_name}.safetensors``
    (reference activation_caching.py:454-463), and loading validates the
    aggregation function and n_collect (activation_caching.py:490-525).
    """

    def __init__(self, layer_names: list[str], aggregation_fn: Callable, n_collect: int):
        self.layer_names = list(layer_names)
        self.aggregation_fn = aggregation_fn
        self.n_collect = n_collect
        self.sample_idx_counter: dict[str, int] = {name: 0 for name in self.layer_names}

        agg_fn_name = getattr(aggregation_fn, "__name__", None)
        if agg_fn_name is None or agg_fn_name == "<lambda>":
            raise ValueError(
                "aggregation_fn needs a stable __name__ (it is serialized into cache "
                "filenames); pass a module-level function rather than a lambda"
            )
        self.agg_fn_name = agg_fn_name

        self.cache: dict[str, ActMax] = {name: ActMax(n_collect=n_collect) for name in self.layer_names}

    def __getitem__(self, layer_name: str) -> ActMax:
        return self.cache[layer_name]

    def __iter__(self):
        return iter(self.cache.values())

    def __repr__(self) -> str:
        return (
            f"ActMaxCache(layers={list(self.layer_names)}, "
            f"aggregation_fn='{self.agg_fn_name}', n_collect={self.n_collect})"
        )

    def update_layer(self, layer_name: str, raw_activation) -> None:
        """Aggregate one layer's raw activation and merge it into the top-k.

        Host-driven convenience path (mirrors the reference hook body,
        activation_caching.py:403-418); the fused jit path used by the
        streaming engine bypasses this and calls
        :func:`semanticlens_tpu.ops.topk.topk_update` directly.
        """
        aggregated = self.aggregation_fn(raw_activation)
        assert aggregated.ndim == 2, "Something is wrong with the aggregation_fn"
        batch_size = int(aggregated.shape[0])
        start = self.sample_idx_counter[layer_name]
        sample_ids = np.arange(start, start + batch_size, dtype=np.int32)
        self.sample_idx_counter[layer_name] += batch_size
        self.cache[layer_name].update(aggregated, sample_ids)

    @property
    def metadata(self) -> dict[str, str]:
        return dict(
            aggregation_fn_name=self.agg_fn_name,
            n_collect=str(self.n_collect),
            layer_names=str(list(self.cache.keys())),
        )

    def _layer_fname(self, layer_name: str) -> str:
        return "-".join([self.agg_fn_name, str(self.n_collect), layer_name]) + ".safetensors"

    def store(self, directory: Path | str):
        """Save one safetensors file per layer into ``directory``."""
        directory = Path(directory)
        directory.mkdir(parents=True, exist_ok=True)

        n_written = 0
        for layer_name, act_max in self.cache.items():
            if not act_max.is_setup:
                logger.warning("layer '%s' never received activations — nothing to write", layer_name)
                continue
            metadata = {
                "aggregation_fn_name": self.agg_fn_name,
                "n_collect": str(self.n_collect),
                "n_latents": str(act_max.n_latents),
                "layer_name": layer_name,
            }
            act_max.store(directory / self._layer_fname(layer_name), metadata=metadata)
            n_written += 1
        logger.info("wrote %d layer file(s) under %s", n_written, directory)

    def load(self, directory: Path | str):
        """Load and validate per-layer files; raises FileNotFoundError on any miss.

        Matches the reference's load contract (activation_caching.py:467-534):
        missing files or mismatched aggregation-fn/n_collect metadata raise
        ``FileNotFoundError`` so callers fall back to recomputation.
        """
        directory = Path(directory)
        if not directory.is_dir():
            raise FileNotFoundError(f"no cache directory at {directory}")

        logger.info("looking for '%s' caches under %s", self.agg_fn_name, directory)
        loaded: dict[str, ActMax] = {}
        for layer_name in self.layer_names:
            fpath = directory / self._layer_fname(layer_name)
            problem = self._check_layer_file(fpath)
            if problem is not None:
                logger.warning("cache miss for layer '%s': %s", layer_name, problem)
                # Callers treat FileNotFoundError as "recompute the sweep", so
                # a stale/incompatible file is reported the same way as a
                # missing one.
                raise FileNotFoundError(f"unusable cache file {fpath}: {problem}")
            loaded[layer_name] = ActMax.load(fpath)

        self.cache.update(loaded)
        logger.info("restored %d layer(s) from %s", len(loaded), directory)

    def _check_layer_file(self, fpath: Path) -> str | None:
        """Return a human-readable reason the file is unusable, or None if OK."""
        if not fpath.exists():
            return "file does not exist"
        with safe_open(str(fpath), framework="numpy") as f:
            metadata = f.metadata() or {}
        found_agg = metadata.get("aggregation_fn_name")
        if found_agg != self.agg_fn_name:
            return f"written with aggregation_fn '{found_agg}', this cache expects '{self.agg_fn_name}'"
        try:
            found_k = int(metadata.get("n_collect"))
        except (TypeError, ValueError):
            return f"corrupt n_collect metadata: {metadata.get('n_collect')!r}"
        if found_k != self.n_collect:
            return f"written with n_collect={found_k}, this cache expects {self.n_collect}"
        return None
