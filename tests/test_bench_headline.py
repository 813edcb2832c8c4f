"""The driver parses the LAST JSON line of a ~2,000-char stdout TAIL.

Rounds 3 and 4 both recorded ``parsed: null`` — round 4 because the final
emitted line outgrew the tail buffer and was truncated mid-object. This test
pins the fix: every stdout emission of bench.py is the compact projection
``make_headline(result)``, whose serialized size must stay far under the
tail no matter how much measurement detail the full result accumulates.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fat_result() -> dict:
    """A result dict at least as large as a fully populated round-4 run."""
    return {
        "metric": "concept-DB build imgs/s/chip (fused ResNet-50 collect + CLIP ViT-B/32 embed)",
        "value": 226.65,
        "unit": "imgs/s/chip",
        "vs_baseline": 113.952,
        "fused_compute_imgs_per_s": 5064.5,
        "sustained_imagenet_scale_imgs_per_s": 5708.2,
        "sustained_measured": True,
        "mfu_pct": 48.7,
        "model_flops_per_img": bench.MODEL_FLOPS_PER_IMG,
        "detail": {
            "padding": "x" * 8000,  # detail may grow without bound
            "nested": {str(i): list(range(20)) for i in range(50)},
            "baseline": {"ref_imgs_per_s": 1.989, "note": "y" * 500},
        },
    }


def test_headline_fits_driver_tail():
    line = json.dumps(bench.make_headline(_fat_result()))
    assert len(line) < 1200, f"headline line is {len(line)} bytes; driver tail is ~2000"


def test_headline_has_driver_contract_fields():
    headline = bench.make_headline(_fat_result())
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in headline
    assert "detail" not in headline
    assert headline["detail_file"] == "BENCH_DETAIL.json"


def test_headline_trend_fields_present():
    headline = bench.make_headline(_fat_result())
    assert headline["fused_compute_imgs_per_s"] == 5064.5
    assert headline["sustained_imagenet_scale_imgs_per_s"] == 5708.2
    assert headline["sustained_measured"] is True
    assert headline["mfu_pct"] == 48.7


def test_headline_omits_empty_flags_and_truncates_errors():
    result = _fat_result()
    headline = bench.make_headline(result)
    assert "provisional" not in headline  # absent when falsy
    assert "error" not in headline

    result["provisional"] = True
    result["error"] = "e" * 5000
    headline = bench.make_headline(result)
    assert headline["provisional"] is True
    assert len(headline["error"]) == 200
    assert len(json.dumps(headline)) < 1500


def test_every_headline_key_is_scalar():
    headline = bench.make_headline(_fat_result())
    for key, v in headline.items():
        assert v is None or isinstance(v, (str, int, float, bool)), (key, type(v))
