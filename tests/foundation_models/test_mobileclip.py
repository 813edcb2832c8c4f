"""MobileCLIP smoke tests (random weights, reference test strategy)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.foundation_models.mobileclip import (
    MOBILECLIP_PRESETS,
    ClipMobile,
    MobileCLIPConfig,
    init_mobileclip_params,
    mobileclip_encode_image,
)
from semanticlens_tpu.foundation_models.clip import TextCfg


TINY = MobileCLIPConfig(
    embed_dim=16,
    image_size=32,
    depths=(1, 1, 1, 1),
    dims=(8, 16, 24, 32),
    attn_heads=2,
    text=TextCfg(context_length=10, vocab_size=50, width=16, heads=2, layers=1),
)


def test_image_tower_shapes():
    params = init_mobileclip_params(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
    out = np.asarray(mobileclip_encode_image(params, TINY, x))
    assert out.shape == (2, 16)
    assert np.isfinite(out).all()


def test_clipmobile_api():
    import semanticlens_tpu.foundation_models.mobileclip as mc

    old = dict(mc.MOBILECLIP_PRESETS)
    mc.MOBILECLIP_PRESETS["MobileCLIP-S1"] = TINY
    try:
        fm = ClipMobile("s1", dtype=jnp.float32)
        imgs = np.random.default_rng(1).integers(0, 255, size=(2, 48, 48, 3), dtype=np.uint8)
        emb = np.asarray(fm.encode_image(fm.preprocess(imgs)))
        assert emb.shape == (2, 16)
        txt = np.asarray(fm.encode_text(fm.tokenize(["a dog", "a cat"])))
        assert txt.shape == (2, 16)
    finally:
        mc.MOBILECLIP_PRESETS.clear()
        mc.MOBILECLIP_PRESETS.update(old)


def test_unknown_version_raises():
    with pytest.raises(ValueError):
        ClipMobile("s9")


def test_presets_exist():
    assert set(MOBILECLIP_PRESETS) == {"MobileCLIP-S1", "MobileCLIP-S2"}
