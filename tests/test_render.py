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


def _random_heatmap(rng):
    h, w = int(rng.integers(8, 64)), int(rng.integers(8, 64))
    heat = np.zeros((h, w), np.float32)
    r1, c1 = int(rng.integers(0, h)), int(rng.integers(0, w))
    r2, c2 = int(rng.integers(r1, h)) + 1, int(rng.integers(c1, w)) + 1
    heat[r1:r2, c1:c2] = rng.random((r2 - r1, c2 - c1)) + 0.5
    return heat, (r1, r2, c1, c2)


def test_square_crop_box_properties():
    """Property tests for _get_square_crop_box: (near-)square, covers the
    thresholded mask, clamps only at the near border, stays deterministic."""
    rng = np.random.default_rng(42)
    for _ in range(200):
        heat, (r1, r2, c1, c2) = _random_heatmap(rng)
        row1, row2, col1, col2 = _get_square_crop_box(heat, crop_th=0.1)
        dr, dc = row2 - row1, col2 - col1
        # near-square: integer halving may leave the widened axis 1 short
        assert abs(dr - dc) <= 1
        # covers the active region entirely
        assert row1 <= r1 and row2 >= r2 and col1 <= c1 and col2 >= c2
        # near border clamped, far border may exceed (numpy slicing clamps)
        assert row1 >= 0 and col1 >= 0
        # crop retains every above-threshold pixel
        mask = np.abs(heat) > 0.1 * 1.0
        assert mask[row1:row2, col1:col2].sum() == mask.sum()


def test_square_crop_box_matches_reference_arithmetic():
    """Pin the exact reference expansion arithmetic (render.py:13-32):
    shorter axis widened by floor(diff/2) on each side, negative starts
    slide the window instead of shrinking it."""
    heat = np.zeros((40, 40), np.float32)
    heat[0:3, 5:20] = 1.0  # tall-thin inverse: dr=3, dc=15 -> widen rows
    row1, row2, col1, col2 = _get_square_crop_box(heat, 0.5)
    # deficit 12 -> 6 each side; row1 would be -6 -> slides to 0, row2 = 15
    assert (row1, row2, col1, col2) == (0, 15, 5, 20)

    heat2 = np.zeros((40, 40), np.float32)
    heat2[10:15, 8:18] = 1.0  # dr=5, dc=10, odd deficit 5 -> 2 each side
    row1, row2, col1, col2 = _get_square_crop_box(heat2, 0.5)
    assert (row1, row2, col1, col2) == (8, 17, 8, 18)
    assert (row2 - row1) == 9  # one short of square: reference quirk kept


def test_square_crop_box_degenerate_heatmap_squares_full_image():
    # all-below-threshold -> crop range is the whole image; the box is then
    # squared like any other, with the far edge past the image (numpy slicing
    # clamps it) — same as the reference arithmetic.
    heat = np.zeros((16, 24), np.float32)
    assert _get_square_crop_box(heat, 0.5) == (0, 24, 0, 24)
