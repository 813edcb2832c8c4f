"""FM self-dissection: neuron/head → joint-embedding direction maps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.foundation_models.clip import (
    CLIPConfig,
    TextCfg,
    VisionCfg,
    init_clip_params,
    vit_encode_image,
)
from semanticlens_tpu.foundation_models.dissect import (
    attention_head_directions,
    mlp_neuron_directions,
    residual_directions_to_embedding,
)

TINY = CLIPConfig(
    embed_dim=16,
    vision=VisionCfg(kind="vit", image_size=16, patch_size=8, width=32, layers=2, heads=2),
    text=TextCfg(context_length=12, vocab_size=50, width=32, heads=2, layers=2),
)


@pytest.fixture(scope="module")
def params():
    return init_clip_params(jax.random.PRNGKey(0), TINY)


def test_shapes_and_bounds(params):
    d = mlp_neuron_directions(params, TINY, 1)
    assert d.shape == (4 * 32, 16) and np.isfinite(d).all()
    dt = mlp_neuron_directions(params, TINY, 0, tower="text")
    assert dt.shape == (4 * 32, 16)
    h = attention_head_directions(params, TINY, 0)
    assert h.shape == (2, 16, 16)
    with pytest.raises(ValueError, match="out of range"):
        mlp_neuron_directions(params, TINY, 5)
    with pytest.raises(ValueError, match="tower"):
        residual_directions_to_embedding(params, np.zeros((1, 32)), tower="bogus")
    with pytest.raises(ValueError, match="directions must be"):
        residual_directions_to_embedding(params, np.zeros((1, 7)))


def test_direction_matches_causal_neuron_bump(params):
    """The linearized direction must match the ACTUAL output change from
    bumping one neuron's post-GELU activation in the LAST block (no
    downstream mixing → only the dropped 1/std and re-centering differ,
    both positive-scale/cosine-invariant)."""
    block, neuron = 1, 7  # last block of the tiny tower
    d = mlp_neuron_directions(params, TINY, block)[neuron]

    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 16, 16, 3)).astype(np.float32))

    def embed_with_bump(eps):
        # Bump the neuron's contribution via the fc2 BIAS: adds eps * w_row
        # to every token's stream exactly like a +eps activation change would.
        p = dict(params)
        key = f"visual.transformer.resblocks.{block}.mlp.c_proj.bias"
        w_row = np.asarray(params[f"visual.transformer.resblocks.{block}.mlp.c_proj.weight"])[neuron]
        p[key] = params[key] + jnp.asarray(eps * w_row)
        return np.asarray(vit_encode_image(p, TINY, img))[0]

    base = embed_with_bump(0.0)
    bumped = embed_with_bump(0.05)
    delta = bumped - base
    cos = float(np.dot(delta, d) / (np.linalg.norm(delta) * np.linalg.norm(d) + 1e-12))
    assert cos > 0.98, f"linearized direction diverges from causal bump (cos={cos:.3f})"


def test_directions_are_labelable_with_existing_machinery(params):
    """The direction bank plugs straight into label_components/cosine_probe."""
    from semanticlens_tpu.lens import label_components
    from semanticlens_tpu.scores import cosine_probe

    dirs = mlp_neuron_directions(params, TINY, 1)
    vocab = ["a", "b", "c"]
    ve = np.random.default_rng(1).normal(size=(3, 16)).astype(np.float32)

    class NoTextFM:
        name = "stub"

    words, scores = label_components(NoTextFM(), vocab, dirs, top_m=2, vocab_embeds=ve)
    assert len(words) == dirs.shape[0] and scores.shape == (dirs.shape[0], 2)

    sims = np.asarray(cosine_probe(ve, dirs))
    assert sims.shape == (3, dirs.shape[0])


TINY_RN = CLIPConfig(
    embed_dim=16,
    vision=VisionCfg(kind="resnet", image_size=32, layers=(1, 1, 1, 1), resnet_width=8),
    text=TextCfg(context_length=12, vocab_size=50, width=32, heads=2, layers=2),
)


@pytest.fixture(scope="module")
def rn_params():
    return init_clip_params(jax.random.PRNGKey(1), TINY_RN)


def test_rn_attnpool_neuron_directions(rn_params):
    """RN-CLIP neuron-attention decomposition (arXiv:2509.19943): shapes,
    head-sum consistency, and agreement with a causal channel bump pushed
    through the real tower."""
    from semanticlens_tpu.foundation_models.clip import resnet_encode_image
    from semanticlens_tpu.foundation_models.dissect import (
        resnet_attnpool_neuron_directions,
        resnet_attnpool_neuron_head_directions,
    )

    c_width = 8 * 32  # CLIP ModifiedResNet: final channels = resnet_width * 32
    d = resnet_attnpool_neuron_directions(rn_params)
    assert d.shape == (c_width, 16) and np.isfinite(d).all()
    dh = resnet_attnpool_neuron_head_directions(rn_params)
    assert dh.shape == (c_width, c_width // 64, 16)
    np.testing.assert_allclose(dh.sum(axis=1), d, rtol=1e-4, atol=1e-5)
    with pytest.raises(ValueError, match="divisible"):
        resnet_attnpool_neuron_head_directions(rn_params, head_dim=7)

    # causal: bump channel c at EVERY attnpool token via the positional
    # embedding; to first order the embedding moves along the channel's
    # direction (attention re-weighting is second-order)
    chan = 5
    img = jnp.asarray(np.random.default_rng(2).normal(size=(1, 32, 32, 3)).astype(np.float32))

    def embed(eps):
        p = dict(rn_params)
        key = "visual.attnpool.positional_embedding"
        bump = np.zeros(np.asarray(rn_params[key]).shape, np.float32)
        bump[:, chan] = eps
        p[key] = rn_params[key] + jnp.asarray(bump)
        return np.asarray(resnet_encode_image(p, TINY_RN, img))[0]

    delta = embed(0.01) - embed(0.0)
    cos = float(np.dot(delta, d[chan]) / (np.linalg.norm(delta) * np.linalg.norm(d[chan]) + 1e-12))
    assert cos > 0.98, f"direction diverges from causal channel bump (cos={cos:.3f})"
