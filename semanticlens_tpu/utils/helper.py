"""Naming and preprocessing helpers.

TPU-native re-implementation of the helper utilities of SemanticLens
(reference: semanticlens/utils/helper.py:11-74). Cache identity must be stable
across processes, so fallback names hash the object's ``repr`` with sha256
exactly like the reference does.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np


def _string_hash(s: str) -> int:
    """Stable (process-independent) integer hash of a string."""
    return int(hashlib.sha256(s.encode()).hexdigest(), 16)


def host_c_array(x, dtype=None) -> np.ndarray:
    """Materialize ``x`` on host as a C-contiguous numpy array.

    Every array headed into raw-buffer serialization (safetensors) MUST pass
    through here: on TPU backends ``np.asarray(jax_array)`` can hand back an
    **F-contiguous** view of the device layout (minor dim first), and
    ``astype``'s default ``order='K'`` preserves that — safetensors then
    serializes the raw buffer as if C-ordered, silently writing transposed
    data. numpy *math* on such arrays is fine (strides are respected); only
    byte-level writers break.
    """
    return np.ascontiguousarray(np.asarray(x), dtype=dtype)


def get_fallback_name(obj) -> str:
    """Fallback cache name: ``<ClassName>-<sha256(repr)>``.

    Mirrors reference semanticlens/utils/helper.py:16-18 so that cache
    directories computed by either implementation agree for objects with
    identical reprs.
    """
    return obj.__class__.__name__ + "-" + str(_string_hash(str(obj)))


def make_preprocess_fn(
    size: int = 224,
    crop: int | None = None,
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
    interpolation: str = "bicubic",
):
    """Build a device-side preprocessing fn from a torchvision-style config.

    TPU-native analogue of the reference's ``to_transforms_compose``
    (reference semanticlens/utils/helper.py:21-35, which converts a
    torchvision ImageClassification preset into a host Compose): here the
    resize → center-crop → normalize pipeline is one jitted on-device program
    usable as a visualizer's ``model_preprocess``.
    """
    from semanticlens_tpu.ops.preprocess import preprocess_images

    crop_size = crop or size

    def preprocess(images):
        return preprocess_images(
            images,
            size=size,
            crop=crop_size,
            mean=tuple(mean),
            std=tuple(std),
            interpolation=interpolation,
        )

    return preprocess


def to_transforms_compose(instance):
    """Convert a torchvision ``ImageClassification`` preset to a device fn.

    Direct API analogue of the reference helper (reference
    semanticlens/utils/helper.py:21-35): reads ``resize_size`` /
    ``crop_size`` / ``mean`` / ``std`` / ``interpolation`` off the preset
    object and returns the equivalent fused on-device pipeline
    (:func:`make_preprocess_fn`). Works with any object exposing those
    attributes — torchvision need not be installed.
    """

    def _scalar(v, default):
        if v is None:
            return default
        if isinstance(v, (list, tuple)):
            return int(v[0])
        return int(v)

    size = _scalar(getattr(instance, "resize_size", None), 256)
    crop = _scalar(getattr(instance, "crop_size", None), size)
    interp = str(getattr(instance, "interpolation", "bicubic")).split(".")[-1].lower()
    if interp not in ("bilinear", "bicubic", "nearest"):
        interp = "bicubic"
    return make_preprocess_fn(
        size=size,
        crop=crop,
        mean=tuple(getattr(instance, "mean", (0.485, 0.456, 0.406))),
        std=tuple(getattr(instance, "std", (0.229, 0.224, 0.225))),
        interpolation=interp,
    )


def get_denormalization_transform(
    mean: Sequence[float] = (0.485, 0.456, 0.406),
    std: Sequence[float] = (0.229, 0.224, 0.225),
):
    """Return a function undoing channel normalization of an image array.

    The returned callable accepts arrays shaped ``(..., H, W, C)`` (channels
    last, the TPU-native layout) and returns ``x * std + mean``.

    Reference capability: semanticlens/utils/helper.py:38-74 (torchvision
    Compose of two Normalize ops); here it is a single fused numpy expression.
    """
    mean_arr = np.asarray(mean, dtype=np.float32)
    std_arr = np.asarray(std, dtype=np.float32)

    def denormalize(x):
        return np.asarray(x, dtype=np.float32) * std_arr + mean_arr

    return denormalize
