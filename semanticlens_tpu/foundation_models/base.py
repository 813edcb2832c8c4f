"""Abstract vision-language foundation-model protocol.

Interface parity with the reference ``AbstractVLM``
(reference: semanticlens/foundation_models/base.py:12-120): encode_image,
encode_text, preprocess, tokenize. Device handling differs by design — JAX
places arrays via shardings, so ``device``/``to`` are compatibility shims.

Conventions for TPU-native implementations:

- ``preprocess`` takes host images — a (B, H, W, C) uint8/float numpy array,
  a single image, or a list of images/PILs — and returns a device-ready
  (B, H', W', C) float array (resize/crop/normalize run on device).
- ``encode_image`` / ``encode_text`` are jitted and return L2-unnormalized
  embeddings, like the reference towers.
"""

from __future__ import annotations

from abc import ABC, abstractmethod


class AbstractVLM(ABC):
    """Vision-language foundation model protocol."""

    @abstractmethod
    def encode_image(self, img):
        """(B, H, W, C) preprocessed images → (B, D) embeddings."""

    @abstractmethod
    def encode_text(self, text_input):
        """(B, T) token ids → (B, D) embeddings."""

    @abstractmethod
    def preprocess(self, img):
        """Host image(s) → device-ready model input."""

    @abstractmethod
    def tokenize(self, txt):
        """String or list of strings → (B, T) token ids."""

    @property
    def device(self):
        return None

    def to(self, device):
        return self
