"""On-device image preprocessing: resize → center-crop → normalize, fused.

The reference preprocesses PILs lazily on the host through torchvision
transforms inside the embed loop (reference: activation_based.py:414-428,
clip.py:137-163) — host CPU work serialized with the device. Here raw uint8
batches are shipped to the device once and the whole pipeline runs as one
jitted XLA program (bicubic resize with anti-aliasing for downscaling, like
torchvision/PIL), feeding the encoder without a host round trip.

Parity note: PIL's bicubic uses a=-0.5; jax.image uses the Keys kernel
(a=-0.5) with anti-aliasing on downsample — close enough for the
cosine ≥ 0.999 embedding target (validated in tests against torch where
available).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# OpenAI CLIP normalization constants.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# SigLIP normalization.
SIGLIP_MEAN = (0.5, 0.5, 0.5)
SIGLIP_STD = (0.5, 0.5, 0.5)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@functools.partial(jax.jit, static_argnames=("size", "crop", "mean", "std", "interpolation"))
def preprocess_images(
    images,
    *,
    size: int = 224,
    crop: int = 224,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    interpolation: str = "bicubic",
):
    """(B, H, W, C) uint8 (0–255) or float (0–1) → normalized (B, crop, crop, C).

    Float inputs MUST be pre-scaled to [0, 1] — dtype is the only signal
    available inside jit (a value-dependent branch would break tracing); the
    foundation models' ``preprocess`` wrappers rescale host floats in 0–255
    before shipping.

    Matches torchvision's ``Resize(size) → CenterCrop(crop) → ToTensor →
    Normalize`` semantics: the shorter side is scaled to ``size`` keeping
    aspect ratio, then a central ``crop×crop`` window is taken.
    """
    x = images.astype(jnp.float32)
    # Scale to [0, 1]: uint8 sources arrive in [0, 255].
    if images.dtype == jnp.uint8:
        x = x / 255.0

    b, h, w, c = x.shape
    # Shorter side → `size`, preserving aspect (static shapes required: the
    # output H', W' are Python ints computed from the static input shape).
    if h <= w:
        new_h, new_w = size, max(1, round(w * size / h))
    else:
        new_h, new_w = max(1, round(h * size / w)), size
    if (new_h, new_w) != (h, w):
        x = jax.image.resize(x, (b, new_h, new_w, c), method=interpolation, antialias=True)
        x = jnp.clip(x, 0.0, 1.0)

    top = (new_h - crop) // 2
    left = (new_w - crop) // 2
    x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, crop, crop, c))

    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)
    return (x - mean_arr) / std_arr
