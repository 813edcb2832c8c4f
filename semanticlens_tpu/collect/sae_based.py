"""SAE component visualizer: audit sparse-autoencoder latents as components.

Beyond-reference capability (the reference's visualizers cover only native
neurons / conv channels, reference
semanticlens/component_visualization/activation_based.py:41): a trained
sparse autoencoder (:mod:`semanticlens_tpu.sae`) decomposes one layer's
activation space into ``n_latents`` sparse directions; this visualizer runs
the standard Collect pipeline over those latents by wrapping the subject
model with :class:`~semanticlens_tpu.sae.SAESubjectModel`, whose virtual tap
``"{layer}.sae"`` yields the SAE code field.

Everything downstream is inherited unchanged from
:class:`~semanticlens_tpu.collect.activation_based.ActivationComponentVisualizer`:
the fused single-pass Collect+Embed engine, mesh data parallelism,
reference-format safetensors caching (under a ``SAEComponentVisualizer``
cache namespace keyed by a content hash of the trained dictionary),
checkpoint/resume, ``visualize_components``, and the ``Lens`` Analyze stage —
SAE latents get top-k evidence, CLIP embeddings, text search, clarity /
polysemanticity scores, and CLIP-Dissect naming exactly like neurons.
"""

from __future__ import annotations

import logging
from typing import Mapping

from semanticlens_tpu.collect.activation_based import ActivationComponentVisualizer
from semanticlens_tpu.models.base import SubjectModel
from semanticlens_tpu.ops import aggregators
from semanticlens_tpu.sae import SAEConfig, SAESubjectModel, train_sae_on_layer

logger = logging.getLogger(__name__)


class SAEComponentVisualizer(ActivationComponentVisualizer):
    """Collect concept examples for each latent of an SAE trained on a layer.

    Parameters (beyond the base visualizer's)
    ----------
    model : the *base* subject model (not pre-wrapped).
    layer_name : single tap the SAE was trained on.
    sae_params : trained SAE parameters (``semanticlens_tpu.sae``). The
        trainers stamp the encode-time sparsity into the artifact as a
        ``"k"`` entry, so it normally travels with the weights.
    k : override of the encode-time TopK sparsity (0 = ReLU encoder).
        Defaults to the value stored in ``sae_params``; raises if neither is
        available or if both are given and disagree.

    The per-image score of latent ``f`` defaults to the max of its code over
    spatial/token positions (``aggregate_max_auto``) — the standard
    "dashboard" statistic for SAE features; sparse codes make the mean
    near-zero and uninformative. Any aggregator can be passed instead.
    """

    def __init__(
        self,
        model: SubjectModel,
        dataset_model,
        dataset_fm,
        layer_name: str,
        sae_params: Mapping,
        num_samples: int,
        *,
        k: int | None = None,
        device=None,
        aggregate_fn=None,
        cache_dir: str | None = None,
        mesh=None,
        params=None,
        model_preprocess=None,
    ):
        base_params = params if params is not None else getattr(model, "params", None)
        if base_params is None:
            raise ValueError("Model weights required: pass `params=` or set `model.params`.")
        wrapped = SAESubjectModel(
            model,
            layer_name,
            sae_params,
            k=k,
            base_params=base_params,
        )
        self.base_model = model
        self.sae_layer = layer_name
        super().__init__(
            wrapped,
            dataset_model,
            dataset_fm,
            layer_names=[wrapped.sae_tap],
            num_samples=num_samples,
            device=device,
            aggregate_fn=aggregate_fn or aggregators.aggregate_max_auto,
            cache_dir=cache_dir,
            mesh=mesh,
            params=wrapped.params,
            model_preprocess=model_preprocess,
        )

    @staticmethod
    def train(
        model: SubjectModel,
        dataset,
        layer_name: str,
        cfg: SAEConfig,
        *,
        params=None,
        batch_size: int = 64,
        epochs: int = 1,
        mesh=None,
        model_preprocess=None,
        log_every: int = 0,
    ):
        """Train an SAE on ``layer_name``'s activations over ``dataset``
        (streaming, device-resident — :func:`semanticlens_tpu.sae.train_sae_on_layer`)
        and return its parameters, ready for the constructor."""
        params = params if params is not None else getattr(model, "params", None)
        if params is None:
            raise ValueError("Model weights required: pass `params=` or set `model.params`.")
        sae_params, _stats, metrics = train_sae_on_layer(
            model,
            params,
            dataset,
            layer_name,
            cfg,
            batch_size=batch_size,
            epochs=epochs,
            mesh=mesh,
            input_preprocess=model_preprocess,
            log_every=log_every,
        )
        logger.info(
            "trained SAE on %s: loss %.4g fvu %.3f l0 %.1f",
            layer_name, metrics["loss"], metrics["fvu"], metrics["l0"],
        )
        return sae_params
