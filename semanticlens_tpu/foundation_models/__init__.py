"""Vision-language foundation models (JAX towers + tokenizers)."""

from semanticlens_tpu.foundation_models.base import AbstractVLM
from semanticlens_tpu.foundation_models.dissect import (
    attention_head_directions,
    mlp_neuron_directions,
    resnet_attnpool_neuron_directions,
    resnet_attnpool_neuron_head_directions,
    residual_directions_to_embedding,
)
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
    "mlp_neuron_directions",
    "attention_head_directions",
    "resnet_attnpool_neuron_directions",
    "resnet_attnpool_neuron_head_directions",
    "residual_directions_to_embedding",
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


def create(name: str, **kwargs) -> AbstractVLM:
    """Name-based foundation-model factory (open_clip's ``create_model`` shape).

    Routes to the right family: ``"siglip"``/``"siglip2"``/``"ViT-B-16-SigLIP2"``
    → :class:`SigLipV2`; ``"mobileclip-s1"``/``"mobileclip-s2"`` →
    :class:`ClipMobile`; anything else (``"ViT-B-32"``, ``"RN50"``, …) →
    :class:`OpenClip`. Keyword arguments (``checkpoint=``, ``bpe_path=``,
    ``dtype=``, ``mesh=``, …) pass through; kwargs a family doesn't accept
    are dropped by its ``**kwargs`` sink.
    """
    key = name.lower()
    if key in ("siglip", "siglip2", "vit-b-16-siglip2"):
        return SigLipV2(**kwargs)
    if key.startswith("mobileclip"):
        version = key.split("-")[-1] if "-" in key else "s1"
        return ClipMobile(version=version, **kwargs)
    return OpenClip(name, **kwargs)


__all__ += ["create"]
