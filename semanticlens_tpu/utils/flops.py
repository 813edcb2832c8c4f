"""Analytic FLOP counts + TPU peak-FLOPs lookup for MFU accounting.

The benchmark (bench.py) reports ``mfu_pct`` — what fraction of the chip's
bf16 peak the fused Collect+Embed pipeline sustains. That needs (a) the
model FLOPs per image and (b) the hardware peak. Both live here so they are
unit-testable against published numbers.

Convention: one multiply-accumulate = **2 FLOPs** (the convention hardware
peaks use). Most model-zoo tables ("ResNet-50 = 4.1 GFLOPs", "ViT-B/32 =
4.4 GFLOPs") actually report multiply-adds (MACs); the true FLOP count used
for MFU is 2x those. Both numbers are exposed (``*_macs_per_image`` /
``*_flops_per_image``) so the two conventions can't be silently mixed.

Counts cover the matmul/conv work only (BN, activations, pooling, softmax
and the top-k update are bandwidth-bound and contribute <1% of FLOPs); the
published-table parity tests pin the MAC counts to within a few percent.
"""

from __future__ import annotations

_MAC = 2  # FLOPs per multiply-accumulate


def _conv_macs(cin: int, cout: int, k: int, hout: int, wout: int, groups: int = 1) -> int:
    return k * k * (cin // groups) * cout * hout * wout


def resnet_macs_per_image(
    depth: int = 50, image_size: int = 224, num_classes: int = 1000
) -> int:
    """Multiply-accumulates of one ResNet forward (torchvision layout).

    Matches the reference workload's subject model (SURVEY.md §6: ResNet-50
    Collect stage). Validated against the published ~4.1 GMac figure for
    depth=50 @ 224 (tests/test_flops.py).
    """
    stage_blocks = {
        18: (2, 2, 2, 2),
        34: (3, 4, 6, 3),
        50: (3, 4, 6, 3),
        101: (3, 4, 23, 3),
        152: (3, 8, 36, 3),
    }[depth]
    bottleneck = depth >= 50
    expansion = 4 if bottleneck else 1

    s = image_size // 2  # stem conv stride 2
    macs = _conv_macs(3, 64, 7, s, s)
    s //= 2  # maxpool stride 2
    cin = 64
    for stage, n_blocks in enumerate(stage_blocks):
        width = 64 * (2**stage)
        cout = width * expansion
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            s_in, s_out = s, s // stride
            if bottleneck:
                # 1x1 (stride 1, input spatial) -> 3x3 (stride) -> 1x1
                macs += _conv_macs(cin, width, 1, s_in, s_in)
                macs += _conv_macs(width, width, 3, s_out, s_out)
                macs += _conv_macs(width, cout, 1, s_out, s_out)
            else:
                macs += _conv_macs(cin, width, 3, s_out, s_out)
                macs += _conv_macs(width, width, 3, s_out, s_out)
            if stride != 1 or cin != cout:
                macs += _conv_macs(cin, cout, 1, s_out, s_out)  # downsample
            cin, s = cout, s_out
    macs += cin * num_classes  # fc head
    return macs


def vit_macs_per_image(
    image_size: int = 224,
    patch: int = 32,
    width: int = 768,
    layers: int = 12,
    mlp_ratio: float = 4.0,
    out_dim: int = 512,
    cls_token: bool = True,
) -> int:
    """Multiply-accumulates of one ViT image-tower forward (CLIP layout).

    Defaults are CLIP ViT-B/32 — the reference's Embed-stage foundation
    model (SURVEY.md §2 #10, reference ``foundation_models/clip.py:52-62``).
    Validated against the published ~4.4 GMac ViT-B/32 / ~17.5 GMac ViT-B/16
    figures (tests/test_flops.py).
    """
    grid = image_size // patch
    tokens = grid * grid + (1 if cls_token else 0)
    macs = _conv_macs(3, width, patch, grid, grid)  # patch embedding
    per_layer = (
        3 * width * width * tokens  # qkv projection
        + width * width * tokens  # output projection
        + 2 * tokens * tokens * width  # QK^T and AV
        + 2 * int(mlp_ratio * width) * width * tokens  # MLP in + out
    )
    macs += layers * per_layer
    macs += width * out_dim  # final projection (pooled token)
    return macs


def resnet_flops_per_image(depth: int = 50, image_size: int = 224) -> int:
    return _MAC * resnet_macs_per_image(depth, image_size)


def vit_flops_per_image(**kw) -> int:
    return _MAC * vit_macs_per_image(**kw)


# bf16 peak matmul FLOP/s per CHIP, by `jax.devices()[0].device_kind`
# substring. Sources: Google Cloud TPU system-architecture tables (v4 275
# TF/s, v5e 197 TF/s, v5p 459 TF/s, v6e/Trillium 918 TF/s bf16).
_PEAK_BF16 = (
    ("v6", 918e12),
    ("v5p", 459e12),
    ("v5 lite", 197e12),  # jax reports v5e as "TPU v5 lite"
    ("v5litepod", 197e12),
    ("v5e", 197e12),
    ("v5", 459e12),  # bare "v5" -> v5p
    ("v4", 275e12),
)


def tpu_peak_flops_bf16(device_kind: str) -> float | None:
    """Per-chip bf16 peak for a jax ``device_kind`` string, or None."""
    kind = device_kind.lower()
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return None


def mfu_pct(imgs_per_s: float, flops_per_img: float, device_kind: str) -> float | None:
    """Model FLOPs utilization (%) of one chip, or None for unknown chips."""
    peak = tpu_peak_flops_bf16(device_kind)
    if not peak or not imgs_per_s:
        return None
    return round(100.0 * imgs_per_s * flops_per_img / peak, 1)
