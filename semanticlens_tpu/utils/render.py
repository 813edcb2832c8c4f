"""Heatmap-driven rendering of concept examples (crops, masks, borders).

Re-implements the capability of the reference's render module
(reference: semanticlens/utils/render.py:13-341 — built on crp/zennit/
torchvision) with numpy + PIL only: Gaussian-blurred relevance heatmaps
select a square crop box and/or an opacity mask for each concept example.

Layout convention: images are channels-last (H, W, C) float arrays in any
range; heatmaps are (H, W). All functions return lists of PIL.Image (RGB),
like the reference.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFilter


def _gaussian_kernel1d(kernel_size: int) -> np.ndarray:
    """torchvision-compatible kernel: sigma = 0.3·((k−1)·0.5 − 1) + 0.8."""
    sigma = 0.3 * ((kernel_size - 1) * 0.5 - 1) + 0.8
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur_2d(heatmap: np.ndarray, kernel_size: int = 51) -> np.ndarray:
    """Separable Gaussian blur with reflect padding (torchvision semantics)."""
    k = _gaussian_kernel1d(kernel_size)
    pad = kernel_size // 2
    h = np.pad(np.asarray(heatmap, np.float32), ((pad, pad), (0, 0)), mode="reflect")
    h = np.apply_along_axis(lambda col: np.convolve(col, k, mode="valid"), 0, h)
    h = np.pad(h, ((0, 0), (pad, pad)), mode="reflect")
    h = np.apply_along_axis(lambda row: np.convolve(row, k, mode="valid"), 1, h)
    return h


def get_crop_range(heatmap: np.ndarray, crop_th: float):
    """Bounding box (row1, row2, col1, col2) of |heatmap| > crop_th·max.

    ``heatmap`` is expected normalized to max 1 (as the callers do); rows and
    columns whose peak stays below the threshold are cropped away.
    """
    mask = np.abs(heatmap) > crop_th
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    if not rows.any() or not cols.any():
        return 0, heatmap.shape[0], 0, heatmap.shape[1]
    row_idx = np.where(rows)[0]
    col_idx = np.where(cols)[0]
    return int(row_idx[0]), int(row_idx[-1]) + 1, int(col_idx[0]), int(col_idx[-1]) + 1


def _widen_span(lo: int, hi: int, target_len: int) -> tuple[int, int]:
    """Symmetrically widen the half-open span [lo, hi) toward ``target_len``.

    Each side grows by half the deficit, floor-divided — so an odd deficit
    leaves the span one pixel short of ``target_len`` (behavior-parity with
    the reference's integer arithmetic, reference render.py:13-32). A span
    pushed past index 0 slides forward instead of clamping; the far edge is
    deliberately left unclamped — callers slice with numpy, which clamps.
    """
    grow = (target_len - (hi - lo)) // 2
    lo, hi = lo - grow, hi + grow
    if lo < 0:
        hi -= lo
        lo = 0
    return lo, hi


def _get_square_crop_box(heatmap: np.ndarray, crop_th: float):
    """Square crop box covering the relevant region.

    Re-derivation of the capability in reference render.py:13-32: take the
    thresholded bounding box, then widen whichever axis is shorter until the
    box is (near-)square. Property-tested in tests/test_render.py.
    """
    row1, row2, col1, col2 = get_crop_range(heatmap, crop_th)
    side = max(row2 - row1, col2 - col1)
    row1, row2 = _widen_span(row1, row2, side)
    col1, col2 = _widen_span(col1, col2, side)
    return row1, row2, col1, col2


def imgify(img: np.ndarray) -> Image.Image:
    """(H, W, C) float/uint8 array → PIL RGB image, min-max scaled to 0–255."""
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = arr.astype(np.float32)
        lo, hi = float(arr.min()), float(arr.max())
        arr = (arr - lo) / (hi - lo + 1e-12) * 255.0
        arr = arr.astype(np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    return Image.fromarray(arr).convert("RGB")


def _filtered_heat(heatmap: np.ndarray, kernel_size: int) -> np.ndarray:
    f = gaussian_blur_2d(np.asarray(heatmap, np.float32), kernel_size)
    return np.abs(f) / (np.abs(f).max() + 1e-8)


def _validate(alpha, vis_th, crop_th):
    if alpha > 1 or alpha < 0:
        raise ValueError("'alpha' must be between [0, 1]")
    if vis_th >= 1 or vis_th < 0:
        raise ValueError("'vis_th' must be between [0, 1)")
    if crop_th >= 1 or crop_th < 0:
        raise ValueError("'crop_th' must be between [0, 1)")


def crop_and_mask_images(
    data_batch, heatmaps, rf=False, alpha=0.4, vis_th=0.02, crop_th=0.01, kernel_size=51
):
    """Square-crop each image to its heatmap's relevant region.

    The default ``plot_fn`` for relevance-based concept examples (reference
    render.py:269-341). Returns a list of PIL RGB images (sizes vary).
    """
    _validate(alpha, vis_th, crop_th)
    imgs = []
    for i in range(len(data_batch)):
        img = np.asarray(data_batch[i])
        filtered = _filtered_heat(heatmaps[i], kernel_size)
        row1, row2, col1, col2 = _get_square_crop_box(filtered, crop_th)
        imgs.append(imgify(img[row1:row2, col1:col2]))
    return imgs


def vis_lighten_img_border(
    data_batch, heatmaps, rf=False, alpha=0.4, vis_th=0.02, crop_th=0.01, kernel_size=51
):
    """Lighten low-relevance regions toward white; optionally crop (``rf``).

    Reference render.py:35-142 semantics including the "nothing was masked"
    assertion.
    """
    _validate(alpha, vis_th, crop_th)
    imgs = []
    any_masked = False

    for i in range(len(data_batch)):
        img = np.asarray(data_batch[i], np.float32)
        filtered = _filtered_heat(heatmaps[i], kernel_size)
        vis_mask = filtered > vis_th

        if rf:
            row1, row2, col1, col2 = _get_square_crop_box(filtered, crop_th)
            img_t = img[row1:row2, col1:col2]
            vis_mask_t = vis_mask[row1:row2, col1:col2]
            if img_t.sum() != 0 and vis_mask_t.sum() != 0:
                img, vis_mask = img_t, vis_mask_t
                any_masked = True

        if vis_mask.any():
            any_masked = True

        inv = ~vis_mask
        white = img.max() if img.size else 1.0
        m = vis_mask[:, :, None].astype(np.float32)
        inv_m = inv[:, :, None].astype(np.float32)
        out = img * m + (img * (1 - alpha) + white * alpha) * inv_m

        pil = imgify(out).convert("RGBA")
        overlay = np.array(pil).copy()
        overlay[..., 3] = (vis_mask * 255).astype(np.uint8)
        stroked = mystroke(Image.fromarray(overlay), 1, color="black")
        pil.paste(stroked, (0, 0), stroked)
        imgs.append(pil.convert("RGB"))

    if not any_masked:
        raise AssertionError(
            "every heatmap in the batch fell entirely below vis_th — no pixel "
            "survived masking. Lower vis_th or check that the heatmaps are "
            "non-degenerate."
        )
    return imgs


def vis_opaque_img_border(
    data_batch, heatmaps, rf=True, alpha=0.4, vis_th=0.02, crop_th=0.01, kernel_size=51
):
    """Darken/attenuate low-relevance regions; crop to receptive field if ``rf``.

    Reference render.py:145-222 semantics.
    """
    _validate(alpha, vis_th, crop_th)
    imgs = []
    for i in range(len(data_batch)):
        img = np.asarray(data_batch[i], np.float32)
        filtered = _filtered_heat(heatmaps[i], kernel_size)
        vis_mask = filtered > vis_th

        if rf:
            row1, row2, col1, col2 = _get_square_crop_box(filtered, crop_th)
            img_t = img[row1:row2, col1:col2]
            vis_mask_t = vis_mask[row1:row2, col1:col2]
            if img_t.sum() != 0 and vis_mask_t.sum() != 0:
                img, vis_mask = img_t, vis_mask_t

        inv = ~vis_mask
        m = vis_mask[:, :, None].astype(np.float32)
        inv_m = inv[:, :, None].astype(np.float32)
        out = img * m + img * inv_m * alpha

        pil = imgify(out).convert("RGBA")
        overlay = np.array(pil).copy()
        overlay[..., 3] = (vis_mask * 255).astype(np.uint8)
        stroked = mystroke(Image.fromarray(overlay), 1, color="black")
        pil.paste(stroked, (0, 0), stroked)
        imgs.append(pil.convert("RGB"))
    return imgs


def mystroke(img: Image.Image, size: int, color: str = "black") -> Image.Image:
    """Outline the alpha edge of ``img`` with filled ellipses
    (reference render.py:225-266)."""
    X, Y = img.size
    edge = img.filter(ImageFilter.FIND_EDGES).load()
    stroke = Image.new(img.mode, img.size, (0, 0, 0, 0))
    draw = ImageDraw.Draw(stroke)
    fill = (0, 0, 0, 180) if color == "black" else (255, 255, 255, 180)
    for x in range(X):
        for y in range(Y):
            if edge[x, y][3] > 0:
                draw.ellipse((x - size, y - size, x + size, y + size), fill=fill)
    stroke.paste(img, (0, 0), img)
    return stroke
