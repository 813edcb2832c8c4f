"""Real pretrained-weight parity via committed golden fixtures.

``tools/make_golden.py generate`` (run once on a connected machine) commits a
few-KB fixture of embeddings computed from PUBLISHED checkpoints on
deterministic inputs. Wherever ``SEMANTICLENS_ASSETS`` provides the matching
checkpoint, these tests re-convert it and assert cosine ≥ 0.999 offline
(BASELINE.md:18; reference loads published weights at
foundation_models/clip.py:52-62). Without the checkpoint they skip — the
fixture machinery itself is exercised unconditionally below.
"""

import numpy as np
import pytest

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2] / "tools"))

import make_golden
from semanticlens_tpu.foundation_models.assets import find_asset

FIXTURES = sorted(make_golden.FIXTURE_DIR.glob("golden_embeds_*.npz"))


def _find_checkpoint(meta) -> Path | None:
    return find_asset(tuple(meta["ckpt_patterns"]))


def test_golden_fixtures_exist_or_skip_loudly():
    """ALWAYS collected: real-weight parity must never be silently absent.

    The parametrized test below collects ZERO items when ``tests/fixtures/``
    is empty — invisible in a green run. This environment has no network
    egress, so fixtures cannot be generated here; this test turns that
    absence into an explicit, instruction-carrying SKIPPED line (and into a
    real assertion for each family once its fixture is committed)."""
    missing = [k for k in make_golden.FAMILIES if not make_golden.fixture_path(k).exists()]
    if len(missing) == len(make_golden.FAMILIES):
        pytest.skip(
            "NO golden real-weight fixtures committed (tests/fixtures/ is "
            "empty) — cosine >= 0.999 vs published checkpoints (BASELINE.md) "
            "is currently proven only against random-weight torch twins. On "
            "a connected host run ONE command:  python tools/fetch_assets.py "
            "all --verify  (fetches checkpoints, generates "
            f"golden_embeds_*.npz for {sorted(make_golden.FAMILIES)}, checks "
            "cosine) — then commit tests/fixtures/."
        )
    assert not missing, (
        f"golden fixtures exist for some families but not {missing}; "
        "run `python tools/fetch_assets.py all --verify` on a connected host"
    )


@pytest.mark.parametrize(
    "fixture", FIXTURES, ids=[f.stem.replace("golden_embeds_", "") for f in FIXTURES]
)
def test_golden_real_weight_parity(fixture):
    meta, _, _ = make_golden.read_fixture(fixture)
    ckpt = _find_checkpoint(meta)
    if ckpt is None:
        pytest.skip(
            f"checkpoint {meta['ckpt_patterns']} not under SEMANTICLENS_ASSETS "
            "(zero-egress image; run tools/fetch_assets.py on a connected host)"
        )
    result = make_golden.check(meta["family"], ckpt, fixture)
    assert result["pass"], result


# ---------------------------------------------------------------------------
# Offline machinery self-test: a tiny random-weight tower round-trips through
# generate → check (cosine 1), and a perturbed tower fails the gate — so the
# fixture format, deterministic inputs, and comparison logic are themselves
# pinned without any real checkpoint.
# ---------------------------------------------------------------------------


def _tiny_clip(seed: int):
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.foundation_models.clip import (
        CLIPConfig,
        OpenClip,
        TextCfg,
        VisionCfg,
        init_clip_params,
    )

    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionCfg(kind="vit", image_size=32, patch_size=16, width=32, layers=2, heads=2),
        text=TextCfg(context_length=12, vocab_size=64, width=32, heads=2, layers=2),
    )
    fm = OpenClip.__new__(OpenClip)
    fm.url = f"tiny-{seed}"
    fm.cfg = cfg
    fm.preset = "tiny"
    fm.dtype = jnp.float32
    fm.mesh = None
    fm.name = "tiny"
    fm.params = init_clip_params(jax.random.PRNGKey(seed), cfg)
    from semanticlens_tpu.foundation_models.tokenizer import HashTokenizer

    fm.tokenizer = HashTokenizer(cfg.text.vocab_size, cfg.text.context_length)
    import functools

    from semanticlens_tpu.foundation_models.clip import clip_encode_text, vit_encode_image

    fm._encode_image = functools.partial(lambda c, p, x: vit_encode_image(p, c, x), cfg)
    fm._encode_text = functools.partial(lambda c, p, t: clip_encode_text(p, c, t), cfg)
    return fm


def test_fixture_roundtrip_and_gate(tmp_path):
    fm = _tiny_clip(0)
    out = tmp_path / "golden_embeds_tiny.npz"
    make_golden.generate("tiny", out=out, fm=fm, image_size=32)
    assert out.stat().st_size < 64 * 1024, "fixtures must stay a few KB"

    same = make_golden.check("tiny", fixture=out, fm=fm)
    assert same["pass"] and same["image_cosine_min"] > 0.999999

    other = _tiny_clip(1)
    diff = make_golden.check("tiny", fixture=out, fm=other)
    assert not diff["pass"], diff


def test_fixture_meta_contract(tmp_path):
    fm = _tiny_clip(0)
    out = tmp_path / "golden_embeds_tiny.npz"
    make_golden.generate("tiny", out=out, fm=fm, image_size=32)
    meta, img, txt = make_golden.read_fixture(out)
    assert meta["image_seed"] == make_golden.IMAGE_SEED
    assert meta["target_cosine"] == make_golden.TARGET_COSINE
    assert img.shape[0] == make_golden.N_IMAGES and img.dtype == np.float32
    # HashTokenizer ids are machine-dependent in principle → no text embeds
    assert txt is None
    # deterministic inputs really are deterministic across calls
    a = make_golden.deterministic_images(32)
    b = make_golden.deterministic_images(32)
    np.testing.assert_array_equal(a, b)
