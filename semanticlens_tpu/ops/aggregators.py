"""Aggregation functions reducing per-layer activations to (batch, components).

TPU-native counterpart of the reference aggregators
(reference: semanticlens/component_visualization/aggregators.py:38-244).
Differences by design:

- **Layout**: convolutional activations are channels-last (B, H, W, C) — the
  native TPU/XLA layout — instead of torch's (B, C, H, W).
- **No host round trip**: the reference calls ``.detach().cpu()`` inside every
  hook (aggregators.py:61 etc.); here aggregators are pure jnp functions that
  fuse into the jitted Collect step and never leave the device.

Function **names** are serialized into cache filenames and must stay
identical to the reference (aggregators.py:32,
activation_caching.py:454-463) — do not rename.
"""

from __future__ import annotations

import jax.numpy as jnp

def _expect_rank(tensor, ranks: tuple[int, ...], layout: str):
    if tensor.ndim not in ranks:
        raise ValueError(
            f"aggregator expects a rank-{'/'.join(map(str, ranks))} {layout} tensor, "
            f"got rank {tensor.ndim} with shape {tuple(tensor.shape)}; pick an "
            f"aggregation function matching this layer's output layout"
        )


def aggregate_conv_mean(tensor):
    """(B, H, W, C) → (B, C) by spatial mean."""
    _expect_rank(tensor, (4,), "(B, H, W, C)")
    return jnp.mean(tensor, axis=(1, 2))


def aggregate_conv_sum(tensor):
    """(B, H, W, C) → (B, C) by spatial sum (the relevance CV's "sum" target)."""
    _expect_rank(tensor, (4,), "(B, H, W, C)")
    return jnp.sum(tensor, axis=(1, 2))


def aggregate_conv_max(tensor):
    """(B, H, W, C) → (B, C) by spatial max."""
    _expect_rank(tensor, (4,), "(B, H, W, C)")
    return jnp.max(tensor, axis=(1, 2))


def aggregate_transformer_mean(tensor):
    """(B, T, D) → (B, D) by token mean."""
    _expect_rank(tensor, (3,), "(B, T, D)")
    return jnp.mean(tensor, axis=1)


def aggregate_transformer_absmean(tensor):
    """(B, T, D) → (B, D) by mean of absolute values over tokens."""
    _expect_rank(tensor, (3,), "(B, T, D)")
    return jnp.mean(jnp.abs(tensor), axis=1)


def aggregate_transformer_max(tensor):
    """(B, T, D) → (B, D) by token max."""
    _expect_rank(tensor, (3,), "(B, T, D)")
    return jnp.max(tensor, axis=1)


def aggregate_transformer_absmax(tensor):
    """(B, T, D) → (B, D) by max of absolute values over tokens."""
    _expect_rank(tensor, (3,), "(B, T, D)")
    return jnp.max(jnp.abs(tensor), axis=1)


def aggregate_sum_auto(tensor):
    """Rank-dispatching spatial/token sum: (B,H,W,C)→(B,C) or (B,T,D)→(B,D).

    Used by the relevance visualizer, whose attribution targets are defined
    for both conv and transformer taps (crp's ``max_target="sum"``).
    """
    if tensor.ndim == 4:
        return jnp.sum(tensor, axis=(1, 2))
    if tensor.ndim == 3:
        return jnp.sum(tensor, axis=1)
    _expect_rank(tensor, (3, 4), "conv or transformer")


def aggregate_mean_auto(tensor):
    """Rank-dispatching spatial/token mean (see :func:`aggregate_sum_auto`)."""
    if tensor.ndim == 4:
        return jnp.mean(tensor, axis=(1, 2))
    if tensor.ndim == 3:
        return jnp.mean(tensor, axis=1)
    _expect_rank(tensor, (3, 4), "conv or transformer")


def aggregate_max_auto(tensor):
    """Rank-dispatching spatial/token max (see :func:`aggregate_sum_auto`)."""
    if tensor.ndim == 4:
        return jnp.max(tensor, axis=(1, 2))
    if tensor.ndim == 3:
        return jnp.max(tensor, axis=1)
    _expect_rank(tensor, (3, 4), "conv or transformer")


def aggregate_transformer_last_token(tensor):
    """(B, T, D) → (B, D): the FINAL token position.

    The causal-LM summary statistic: with a causal mask every position
    attends only backward, so the last token is the one that saw the whole
    sequence (the autoregressive analogue of a CLS token). Distinct stable
    ``__name__`` so caches collected at different positions can't collide
    (``get_aggregate_transformer_special_token`` reuses one name for every
    position — reference aggregators.py:198-244 has the same quirk).

    PADDING CAVEAT: position T−1 is only the summary position when
    sequences fill the whole window. With RIGHT-padded variable-length
    batches this reads a pad position — LEFT-pad instead (the standard
    causal-LM convention, e.g. Hugging Face generation), which puts every
    sequence's final real token at T−1.
    """
    _expect_rank(tensor, (3,), "(B, T, D)")
    return tensor[:, -1]


def get_aggregate_transformer_special_token(token_position: int):
    """Factory: extract one token position, e.g. 0 for a CLS token.

    The returned function keeps a stable ``__name__`` (required because
    aggregation-function names key the on-disk cache), parameterized by the
    token position.
    """

    def aggregate_transformer_special_token(tensor):
        _expect_rank(tensor, (3,), "(B, T, D)")
        return tensor[:, token_position]

    return aggregate_transformer_special_token
