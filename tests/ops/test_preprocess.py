"""On-device preprocessing tests: semantics + PIL bicubic closeness.

The embedding-parity target (BASELINE.md cosine ≥ 0.999) rests on the
on-device resize tracking PIL/torchvision bicubic closely; asserted here on
smooth images.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from semanticlens_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD, preprocess_images


def test_uint8_scaling_and_normalization():
    img = np.full((1, 8, 8, 3), 255, np.uint8)
    out = np.asarray(preprocess_images(jnp.asarray(img), size=8, crop=8))
    expected = (1.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_center_crop_geometry():
    img = np.zeros((1, 8, 12, 3), np.float32)
    img[0, :, 5, :] = 1.0  # vertical stripe at col 5 of 12
    out = np.asarray(preprocess_images(jnp.asarray(img), size=8, crop=8, mean=(0, 0, 0), std=(1, 1, 1)))
    assert out.shape == (1, 8, 8, 3)
    # Crop window cols = (12-8)//2 .. +8 → stripe lands at col 3.
    assert out[0, 0, :, 0].argmax() == 3


def test_aspect_preserving_resize():
    img = np.zeros((1, 100, 200, 3), np.float32)
    out = np.asarray(
        preprocess_images(jnp.asarray(img), size=50, crop=50, mean=(0, 0, 0), std=(1, 1, 1))
    )
    assert out.shape == (1, 50, 50, 3)


def test_resize_close_to_pil_bicubic():
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    # Smooth image (real photos are smooth at this scale, unlike white noise).
    base = rng.normal(size=(16, 16, 3)).astype(np.float32)
    img = np.kron(base, np.ones((16, 16, 1), np.float32))  # 256×256 blocky-smooth
    img = np.clip((img - img.min()) / (img.max() - img.min()), 0, 1)
    u8 = (img * 255).astype(np.uint8)

    pil = PIL.fromarray(u8).resize((224, 224), PIL.BICUBIC)
    ref = np.asarray(pil, np.float32) / 255.0

    ours = np.asarray(
        preprocess_images(jnp.asarray(u8[None]), size=224, crop=224, mean=(0, 0, 0), std=(1, 1, 1))
    )[0]

    # Cosine similarity of the flattened images must be extremely high.
    a, b = ours.ravel(), ref.ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    assert np.abs(ours - ref).mean() < 0.01
