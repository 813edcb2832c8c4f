"""Attribution-based analysis: LRP heatmaps and relevance-selected examples."""

from semanticlens_tpu.relevance.attribution import component_heatmaps, make_attribution_fn

__all__ = ["component_heatmaps", "make_attribution_fn"]
