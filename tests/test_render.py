"""Render utility tests: validation, masks, strokes, blur parity semantics."""

import numpy as np
import pytest

from semanticlens_tpu.utils.render import (
    _get_square_crop_box,
    crop_and_mask_images,
    gaussian_blur_2d,
    imgify,
    mystroke,
    vis_lighten_img_border,
    vis_opaque_img_border,
)


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 32, 32, 3)).astype(np.float32)
    heat = np.zeros((2, 32, 32), np.float32)
    heat[:, 10:20, 10:20] = 1.0
    return imgs, heat


@pytest.mark.parametrize("fn", [crop_and_mask_images, vis_lighten_img_border, vis_opaque_img_border])
@pytest.mark.parametrize("kwargs", [{"alpha": 1.5}, {"vis_th": 1.0}, {"crop_th": -0.1}])
def test_parameter_validation(fn, batch, kwargs):
    imgs, heat = batch
    with pytest.raises(ValueError):
        fn(imgs, heat, **kwargs)


def test_lighten_raises_when_nothing_masked(batch):
    imgs, _ = batch
    zero_heat = np.zeros((2, 32, 32), np.float32)
    # vis_th > 0 and an all-zero heatmap → no pixel passes → assertion error
    # (reference render.py:135-140 contract).
    with pytest.raises(AssertionError):
        vis_lighten_img_border(imgs, zero_heat, vis_th=0.5)


def test_opaque_rf_crops(batch):
    imgs, heat = batch
    out = vis_opaque_img_border(imgs, heat, rf=True, kernel_size=5, crop_th=0.2)
    assert all(im.size[0] < 32 for im in out)


def test_imgify_scales_to_uint8():
    img = imgify(np.linspace(-1, 1, 27).reshape(3, 3, 3).astype(np.float32))
    arr = np.asarray(img)
    assert arr.dtype == np.uint8
    assert arr.min() == 0 and arr.max() == 255


def test_gaussian_blur_preserves_mass_roughly():
    heat = np.zeros((21, 21), np.float32)
    heat[10, 10] = 1.0
    blurred = gaussian_blur_2d(heat, kernel_size=5)
    np.testing.assert_allclose(blurred.sum(), 1.0, rtol=1e-4)
    assert blurred[10, 10] < 1.0


def test_mystroke_outlines_alpha_edge():
    from PIL import Image

    img = Image.new("RGBA", (16, 16), (0, 0, 0, 0))
    for x in range(4, 12):
        for y in range(4, 12):
            img.putpixel((x, y), (255, 0, 0, 255))
    stroked = mystroke(img, 1)
    assert stroked.size == (16, 16)
    # The stroke extends beyond the original square.
    assert np.asarray(stroked)[3, 4, 3] > 0
