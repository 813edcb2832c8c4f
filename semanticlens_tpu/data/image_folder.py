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
    decoder : "auto" (native C++ thread-pool decode for JPEGs when the
        library builds, PIL otherwise), "native", or "pil". The two decoders
        resample slightly differently (libjpeg DCT prescale + bilinear vs
        PIL full-res bicubic) — keep the choice stable for a given activation
        cache.
    """

    def __init__(
        self,
        root: str | Path,
        image_size: int = 224,
        name: str | None = None,
        decoder: str = "auto",
    ):
        self.root = Path(root)
        if not self.root.is_dir():
            raise FileNotFoundError(f"Dataset root not found: {self.root}")
        self.image_size = image_size
        self.name = name or self.root.name
        if decoder not in ("auto", "native", "pil"):
            raise ValueError(f"decoder must be auto|native|pil, got {decoder!r}")
        self._decoder = decoder

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

    def _pil_decode(self, path: Path) -> np.ndarray:
        img = Image.open(path).convert("RGB")
        w, h = img.size
        scale = self.image_size / min(w, h)
        img = img.resize((max(1, round(w * scale)), max(1, round(h * scale))), Image.BICUBIC)
        w, h = img.size
        left = (w - self.image_size) // 2
        top = (h - self.image_size) // 2
        img = img.crop((left, top, left + self.image_size, top + self.image_size))
        return np.asarray(img, np.uint8)

    def _use_native(self) -> bool:
        if self._decoder == "pil":
            return False
        from semanticlens_tpu.data import native_decoder

        available = native_decoder.is_available()
        if self._decoder == "native" and not available:
            raise RuntimeError("decoder='native' requested but the native decoder failed to build")
        return available

    def __getitem__(self, idx: int):
        path, label = self.samples[idx]
        return self._pil_decode(path), label

    def get_batch(self, start: int, stop: int) -> np.ndarray:
        """Decode samples [start, stop) into one (B, S, S, 3) uint8 block.

        JPEGs go through the native thread-pool decoder when available; other
        formats and any file the native path rejects fall back to PIL. This
        is the batch iterator's preferred entry point (dataset.py
        ``iter_batches``) — per-sample ``__getitem__`` stays PIL for
        bit-stable single-image access.
        """
        entries = self.samples[start:stop]
        jpeg_idx = [
            i for i, (p, _l) in enumerate(entries) if p.suffix.lower() in (".jpg", ".jpeg")
        ]
        if not jpeg_idx or not self._use_native():
            return np.stack([self._pil_decode(p) for p, _l in entries])

        from semanticlens_tpu.data import native_decoder

        if len(jpeg_idx) == len(entries):
            block, failed = native_decoder.decode_batch(
                [p for p, _l in entries], self.image_size
            )
        else:
            block = np.zeros((len(entries), self.image_size, self.image_size, 3), np.uint8)
            sub, failed_sub = native_decoder.decode_batch(
                [entries[i][0] for i in jpeg_idx], self.image_size
            )
            block[jpeg_idx] = sub
            failed = [jpeg_idx[i] for i in failed_sub]
            failed += [i for i in range(len(entries)) if i not in set(jpeg_idx)]
        for i in failed:
            block[i] = self._pil_decode(entries[i][0])
        return block

    def __repr__(self):
        return f"ImageFolder(root='{self.root}', n={len(self.samples)}, image_size={self.image_size})"
