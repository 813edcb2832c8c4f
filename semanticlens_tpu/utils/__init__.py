"""Utility subpackage: naming, logging, rendering helpers."""

from semanticlens_tpu.utils.helper import (
    get_denormalization_transform,
    get_fallback_name,
    make_preprocess_fn,
    to_transforms_compose,
)
from semanticlens_tpu.utils.log_setup import setup_colored_logging
from semanticlens_tpu.utils.profiling import StageTimer, device_trace, force_materialize

__all__ = [
    "get_fallback_name",
    "get_denormalization_transform",
    "make_preprocess_fn",
    "to_transforms_compose",
    "setup_colored_logging",
    "StageTimer",
    "device_trace",
    "force_materialize",
]
