"""Analytic FLOP counters pinned to published model-zoo numbers."""

import json

from semanticlens_tpu.utils.flops import (
    mfu_pct,
    resnet_macs_per_image,
    tpu_peak_flops_bf16,
    vit_macs_per_image,
)


def test_resnet50_macs_match_published():
    # torchvision / paper tables: ResNet-50 @ 224 ~= 4.09-4.12 GMacs
    macs = resnet_macs_per_image(50, 224)
    assert 3.8e9 < macs < 4.3e9, macs


def test_resnet18_macs_match_published():
    # published ~1.82 GMacs
    macs = resnet_macs_per_image(18, 224)
    assert 1.6e9 < macs < 2.0e9, macs


def test_vit_b32_macs_match_published():
    # OpenCLIP / timm tables: ViT-B/32 @ 224 ~= 4.4 GMacs
    macs = vit_macs_per_image(patch=32)
    assert 4.1e9 < macs < 4.7e9, macs


def test_vit_b16_macs_match_published():
    # published ~17.5 GMacs
    macs = vit_macs_per_image(patch=16)
    assert 16.5e9 < macs < 18.5e9, macs


def test_peak_lookup():
    assert tpu_peak_flops_bf16("TPU v5 lite") == 197e12
    assert tpu_peak_flops_bf16("TPU v4") == 275e12
    assert tpu_peak_flops_bf16("TPU v5p chip") == 459e12
    assert tpu_peak_flops_bf16("cpu") is None


def test_mfu_math():
    # 5708 imgs/s * 16.8e9 FLOPs/img on a 197 TF/s chip ~= 48.7%
    flops = 2 * (resnet_macs_per_image(50) + vit_macs_per_image(patch=32))
    pct = mfu_pct(5708.2, flops, "TPU v5 lite")
    assert 40.0 < pct < 60.0, pct
    assert mfu_pct(5708.2, flops, "unknown") is None


def test_mfu_is_json_serializable():
    flops = 2 * (resnet_macs_per_image(50) + vit_macs_per_image(patch=32))
    json.dumps({"mfu_pct": mfu_pct(1000.0, flops, "TPU v5 lite"), "flops": flops})
