"""Directory-of-images dataset with threaded decode.

Real-data counterpart of :class:`~semanticlens_tpu.data.dataset.ArrayDataset`
for ImageNet-style layouts (``root/class_x/img.jpeg``). Images decode to
fixed-size uint8 HWC on the host (PIL, resized so batches have static
shapes); decode happens inside the prefetch thread of the batch iterator, so
it overlaps device compute like the reference's DataLoader workers
(reference activation_based.py:344-349).
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


class ImageFolder:
    """Class-per-subdirectory image dataset yielding (uint8 HWC, label).

    Parameters
    ----------
    root : dataset root; subdirectories define classes (sorted order), flat
        directories get label 0.
    image_size : decoded output size (shorter side resized, center-cropped)
        so every sample has the same static shape.
    name : cache identity; defaults to the root directory's name.
    """

    def __init__(self, root: str | Path, image_size: int = 224, name: str | None = None):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"Dataset root not found: {self.root}")
        self.image_size = image_size
        self.name = name or self.root.name

        classes = sorted(p.name for p in self.root.iterdir() if p.is_dir())
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[Path, int]] = []
        if classes:
            for c in classes:
                for f in sorted((self.root / c).iterdir()):
                    if f.suffix.lower() in _EXTENSIONS:
                        self.samples.append((f, self.class_to_idx[c]))
        else:
            for f in sorted(self.root.iterdir()):
                if f.suffix.lower() in _EXTENSIONS:
                    self.samples.append((f, 0))
        if not self.samples:
            raise ValueError(f"No images found under {self.root}")
        logger.info(f"ImageFolder: {len(self.samples)} images, {max(1, len(classes))} classes")

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))), Image.BICUBIC)
        w, h = img.size
        left = (w - self.image_size) // 2
        top = (h - self.image_size) // 2
        img = img.crop((left, top, left + self.image_size, top + self.image_size))
        return np.asarray(img, np.uint8), label

    def __repr__(self):
        return f"ImageFolder(root='{self.root}', n={len(self.samples)}, image_size={self.image_size})"
