"""Attribution-based analysis: LRP heatmaps and relevance-selected examples."""

from semanticlens_tpu.relevance.attribution import component_heatmaps, make_attribution_fn
from semanticlens_tpu.relevance.text import (
    highlight_evidence,
    make_token_relevance_fn,
    token_relevance,
)

__all__ = ["component_heatmaps", "make_attribution_fn", "make_token_relevance_fn",
           "token_relevance", "highlight_evidence"]
