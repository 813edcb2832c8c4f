"""SigLIP tower smoke tests (random weights, reference test strategy)."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticlens_tpu.foundation_models.siglip import (
    SigLIPConfig,
    init_siglip_params,
    siglip_encode_image,
    siglip_encode_text,
)

TINY = SigLIPConfig(
    embed_dim=32,
    image_size=16,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    text_width=32,
    text_layers=2,
    text_heads=2,
    vocab_size=64,
    context_length=10,
)


def test_siglip_shapes():
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32))
    emb = np.asarray(siglip_encode_image(params, TINY, img))
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()

    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 64, size=(3, 10)), jnp.int32)
    txt = np.asarray(siglip_encode_text(params, TINY, tokens))
    assert txt.shape == (3, 32)
    assert np.isfinite(txt).all()


def test_siglip_no_cls_token_count():
    """Patch grid only — no class token in the sequence (SigLIP pooling)."""
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    assert params["visual.pos_embed"].shape == (4, 32)  # (16/8)² patches


def test_siglip_image_text_dim_consistency():
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    img = jnp.zeros((1, 16, 16, 3), jnp.float32)
    tokens = jnp.zeros((1, 10), jnp.int32)
    d_img = siglip_encode_image(params, TINY, img).shape[-1]
    d_txt = siglip_encode_text(params, TINY, tokens).shape[-1]
    assert d_img == d_txt == TINY.embed_dim
