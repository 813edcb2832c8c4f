"""Token-level LRP attribution for LM components."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import GPT2
from semanticlens_tpu.relevance.text import (
    highlight_evidence,
    make_token_relevance_fn,
    token_relevance,
)

V, T, D = 50, 8, 32


@pytest.fixture(scope="module")
def gpt():
    model = GPT2(vocab_size=V, n_positions=T, width=D, depth=2, heads=2,
                 dtype=jnp.float32)
    return model, model.init(jax.random.PRNGKey(0))


def test_shapes_program_reuse_and_validation(gpt):
    model, params = gpt
    fn = make_token_relevance_fn(model, "transformer.h.1.mlp.act")
    toks = jnp.asarray(np.random.default_rng(0).integers(0, V, size=(3, T)))
    r0 = fn(params, toks, jnp.int32(0))
    r7 = fn(params, toks, jnp.int32(7))  # same program, different component
    assert r0.shape == r7.shape == (3, T)
    assert np.isfinite(np.asarray(r0)).all()
    assert np.abs(np.asarray(r0) - np.asarray(r7)).max() > 0  # distinct targets
    assert np.abs(np.asarray(r0)).max() <= 1.0 + 1e-6  # abs-norm
    with pytest.raises(ValueError, match="embedding tap"):
        make_token_relevance_fn(model, "transformer.h.1.mlp.act",
                                embedding_tap="nope")


def test_epsilon_conservation_bias_free(gpt):
    """ε-composite per-token relevance sums to the target activation on a
    bias-free model (the transformer-LRP conservation property; biases
    AND positional embeddings absorb relevance — both are input-independent
    additive branches — so zero them)."""
    model, params = gpt
    p = {k: (jnp.zeros_like(v) if k.endswith("bias") else v) for k, v in params.items()}
    p["transformer.wpe.weight"] = jnp.zeros_like(p["transformer.wpe.weight"])
    toks = jnp.asarray(np.random.default_rng(1).integers(0, V, size=(2, T)))
    layer = "transformer.h.1.mlp.act"
    rel = token_relevance(model, p, toks, layer, 3, composite="epsilon",
                          abs_norm=False)
    _, taps = model.apply(p, toks, (layer,))
    want = np.asarray(taps[layer], np.float32)[:, :, 3].sum(axis=1)
    np.testing.assert_allclose(np.asarray(rel).sum(axis=1), want, rtol=5e-2, atol=1e-4)


def test_relevance_localizes_the_driving_token(gpt):
    """A component fed by one token's embedding direction must attribute to
    that token: craft wte so token 7 alone carries feature 0 and target an
    early layer fed directly by it."""
    model, params = gpt
    p = dict(params)
    wte = np.zeros((V, D), np.float32)
    wte[7, 0] = 5.0  # token 7 → feature 0, everything else dark
    p["transformer.wte.weight"] = jnp.asarray(wte)
    p["transformer.wpe.weight"] = jnp.zeros_like(p["transformer.wpe.weight"])
    toks = np.full((1, T), 4, np.int64)
    toks[0, 5] = 7
    rel = token_relevance(model, p, jnp.asarray(toks), "transformer.h.0.ln_1", 0,
                          composite="epsilon", abs_norm=True)
    assert int(np.argmax(np.abs(np.asarray(rel)[0]))) == 5


def test_highlight_evidence():
    rel = np.array([[0.1, 0.9, 0.2], [1.0, 0.0, 0.0]])
    strings = [["a", "b", "c"], ["x", "y", "z"]]
    out = highlight_evidence(strings, rel, threshold=0.5)
    assert out == ["a **b** c", "**x** y z"]
