"""Pallas fused cosine kernel vs the XLA reference path."""

import numpy as np

import jax.numpy as jnp

from semanticlens_tpu.ops.pallas_ops import cosine_similarity_matrix


def _ref(x, y):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True).clip(1e-12)
    yn = y / np.linalg.norm(y, axis=1, keepdims=True).clip(1e-12)
    return xn @ yn.T


def test_matches_reference_small():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 64)).astype(np.float32)
    y = rng.normal(size=(7, 64)).astype(np.float32)
    out = np.asarray(cosine_similarity_matrix(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, _ref(x, y), atol=2e-5)


def test_matches_reference_tile_spanning():
    """Sizes that are not tile multiples exercise padding + trimming."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(300, 128)).astype(np.float32)  # > one 256-row tile
    y = rng.normal(size=(513, 128)).astype(np.float32)  # spans three tiles
    out = np.asarray(cosine_similarity_matrix(jnp.asarray(x), jnp.asarray(y)))
    assert out.shape == (300, 513)
    np.testing.assert_allclose(out, _ref(x, y), atol=3e-5)


def test_zero_rows_give_zero_similarity():
    x = np.zeros((2, 32), np.float32)
    y = np.ones((3, 32), np.float32)
    out = np.asarray(cosine_similarity_matrix(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_self_similarity_diagonal_is_one():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(10, 16)).astype(np.float32)
    out = np.asarray(cosine_similarity_matrix(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(np.diag(out), 1.0, atol=1e-5)
