"""Utility subpackage: naming, logging, rendering helpers."""

from semanticlens_tpu.utils.helper import (
    get_denormalization_transform,
    get_fallback_name,
)
from semanticlens_tpu.utils.log_setup import setup_colored_logging

__all__ = [
    "get_fallback_name",
    "get_denormalization_transform",
    "setup_colored_logging",
]
