"""Collect stage: streaming activation capture and top-k example selection."""

from semanticlens_tpu.collect.activation_caching import (
    DEFAULT_AGGREGATION_FUNCTION_MAP,
    ActCache,
    ActMax,
    ActMaxCache,
)

__all__ = [
    "ActCache",
    "ActMax",
    "ActMaxCache",
    "DEFAULT_AGGREGATION_FUNCTION_MAP",
]

from semanticlens_tpu.collect.activation_based import (  # noqa: E402
    ActivationComponentVisualizer,
    MissingNameWarning,
)
from semanticlens_tpu.collect.base import AbstractComponentVisualizer  # noqa: E402
from semanticlens_tpu.collect.engine import CollectEngine  # noqa: E402

__all__ += [
    "ActivationComponentVisualizer",
    "MissingNameWarning",
    "AbstractComponentVisualizer",
    "CollectEngine",
]

from semanticlens_tpu.collect.relevance_based import RelevanceComponentVisualizer  # noqa: E402
from semanticlens_tpu.collect.sae_based import SAEComponentVisualizer  # noqa: E402
from semanticlens_tpu.collect.synthesis_based import SynthesisComponentVisualizer  # noqa: E402

__all__ += ["RelevanceComponentVisualizer", "SAEComponentVisualizer",
            "SynthesisComponentVisualizer"]

from semanticlens_tpu.collect.text_based import (  # noqa: E402
    TextActivationComponentVisualizer,
    TextSAEComponentVisualizer,
    TokenTextDataset,
)

__all__ += ["TextActivationComponentVisualizer", "TextSAEComponentVisualizer",
            "TokenTextDataset"]
