"""Collect stage: streaming activation capture and top-k example selection."""

from semanticlens_tpu.collect.activation_caching import (
    DEFAULT_AGGREGATION_FUNCTION_MAP,
    ActMax,
    ActMaxCache,
)

__all__ = [
    "ActMax",
    "ActMaxCache",
    "DEFAULT_AGGREGATION_FUNCTION_MAP",
]
