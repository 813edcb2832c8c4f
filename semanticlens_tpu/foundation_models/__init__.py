"""Vision-language foundation models (JAX towers + tokenizers)."""

from semanticlens_tpu.foundation_models.base import AbstractVLM
from semanticlens_tpu.foundation_models.clip import (
    CLIP_PRESETS,
    CLIPConfig,
    OpenClip,
    init_clip_params,
    load_openclip_state_dict,
)
from semanticlens_tpu.foundation_models.siglip import (
    SigLipV2,
    init_siglip_params,
    load_siglip_state_dict,
)
from semanticlens_tpu.foundation_models.tokenizer import ClipBpeTokenizer, HashTokenizer

__all__ = [
    "AbstractVLM",
    "OpenClip",
    "SigLipV2",
    "CLIPConfig",
    "CLIP_PRESETS",
    "init_clip_params",
    "load_openclip_state_dict",
    "init_siglip_params",
    "load_siglip_state_dict",
    "ClipBpeTokenizer",
    "HashTokenizer",
]

from semanticlens_tpu.foundation_models.mobileclip import (  # noqa: E402
    ClipMobile,
    MobileCLIPConfig,
    init_mobileclip_params,
)

__all__ += ["ClipMobile", "MobileCLIPConfig", "init_mobileclip_params"]
