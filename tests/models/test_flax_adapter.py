"""Flax adapter tests: linen modules become tappable subject models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

flax = pytest.importorskip("flax")
import flax.linen as nn  # noqa: E402

from semanticlens_tpu.models.flax_adapter import FlaxSubjectModel  # noqa: E402


class SmallCNN(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), name="conv1")(x)
        x = nn.relu(x)
        x = nn.Conv(16, (3, 3), name="conv2")(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(4, name="head")(x)


@pytest.fixture(scope="module")
def adapted():
    example = jax.ShapeDtypeStruct((2, 16, 16, 3), jnp.float32)
    model = FlaxSubjectModel(SmallCNN(), example)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_discovered(adapted):
    model, _ = adapted
    for name in ["conv1", "conv2", "head"]:
        assert name in model.module_names, model.module_names


def test_taps_and_output(adapted):
    model, params = adapted
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32))
    out, taps = model.apply(params, x, tap_names=("conv1", "conv2"))
    assert out.shape == (2, 4)
    assert taps["conv1"].shape == (2, 16, 16, 8)
    assert taps["conv2"].shape == (2, 16, 16, 16)


def test_missing_tap_raises(adapted):
    model, params = adapted
    with pytest.raises(KeyError):
        model.apply(params, jnp.zeros((1, 16, 16, 3)), tap_names=("nonexistent",))


def test_flax_model_in_collect_engine(adapted):
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model, params = adapted
    ds = ArrayDataset(np.random.default_rng(1).normal(size=(12, 16, 16, 3)).astype(np.float32), name="f12")
    eng = CollectEngine(model=model, layer_names=("conv2",), aggregation_fn=aggregate_conv_mean, n_collect=3)
    states, n = eng.run(params, ds, 4)
    assert n == 12
    assert states["conv2"].values.shape == (16, 3)
    assert int(np.asarray(states["conv2"].ids).max()) < 12


def test_root_call_not_advertised(adapted):
    model, _ = adapted
    assert "__call__" not in model.module_names


def test_apply_kwargs_forwarded_to_init():
    class NeedsTrain(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool):
            x = nn.Dense(4, name="d")(x)
            return nn.Dropout(0.5, deterministic=not train)(x)

    example = jax.ShapeDtypeStruct((1, 8), jnp.float32)
    model = FlaxSubjectModel(NeedsTrain(), example, train=False)
    params = model.init(jax.random.PRNGKey(0))
    out, taps = model.apply(params, jnp.ones((1, 8)), tap_names=("d",))
    assert out.shape == (1, 4) and taps["d"].shape == (1, 4)
