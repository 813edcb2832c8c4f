"""Structural and tap tests for the functional ResNet family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.resnet import ResNet


@pytest.fixture(scope="module")
def r18():
    model = ResNet(depth=18, num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_torchvision_compatible(r18):
    model, _ = r18
    for name in ["conv1", "bn1", "relu", "maxpool", "layer1", "layer1.0.conv1",
                 "layer4.1.conv2", "layer2.0.downsample.0", "avgpool", "fc"]:
        assert name in model.module_names, name


def test_forward_shapes_and_taps(r18):
    model, params = r18
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(params, jnp.asarray(x), tap_names=("layer4", "layer1.0.conv1", "avgpool"))
    assert logits.shape == (2, 10)
    assert taps["layer4"].shape == (2, 2, 2, 512)
    assert taps["layer1.0.conv1"].shape == (2, 16, 16, 64)
    assert taps["avgpool"].shape == (2, 1, 1, 512)


def test_no_taps_returns_empty(r18):
    model, params = r18
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    _, taps = model.apply(params, x)
    assert taps == {}


def test_validate_layers(r18):
    model, _ = r18
    validate_layers(model, ["layer4", "layer1.0.conv2"])
    with pytest.raises(ValueError):
        validate_layers(model, ["nonexistent.layer"])


def test_jit_and_determinism(r18):
    model, params = r18
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)).astype(np.float32))

    import functools

    apply_jit = functools.partial(jax.jit, static_argnames=("tap_names",))(
        lambda p, xx, tap_names: model.apply(p, xx, tap_names)
    )
    l1, t1 = apply_jit(params, x, tap_names=("layer3",))
    l2, t2 = apply_jit(params, x, tap_names=("layer3",))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    np.testing.assert_array_equal(np.asarray(t1["layer3"]), np.asarray(t2["layer3"]))


def test_resnet50_bottleneck_shapes():
    model = ResNet(depth=50, num_classes=7, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    logits, taps = model.apply(params, x, tap_names=("layer4", "layer1.0.conv3"))
    assert logits.shape == (1, 7)
    assert taps["layer4"].shape == (1, 2, 2, 2048)
    assert taps["layer1.0.conv3"].shape == (1, 16, 16, 256)
    assert "layer1.0.downsample.0" in model.module_names


def test_load_torch_state_dict_roundtrip():
    """Relayout of a torch-style state dict preserves forward semantics."""
    torch = pytest.importorskip("torch")
    model = ResNet(depth=18, num_classes=4, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2))

    # Build a torch-layout state dict from our params, then load it back.
    sd = {}
    for name, arr in params.items():
        a = np.asarray(arr)
        if a.ndim == 4:
            a = a.transpose(3, 2, 0, 1)  # HWIO → OIHW
        elif name == "fc.weight":
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))
    params2 = model.load_torch_state_dict(sd)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 32, 32, 3)).astype(np.float32))
    out1, _ = model.apply(params, x)
    out2, _ = model.apply(params2, x)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("depth,blocks,expansion", [(34, (3, 4, 6, 3), 1), (101, (3, 4, 23, 3), 4)])
def test_deeper_variants_specs(depth, blocks, expansion):
    model = ResNet(depth=depth, num_classes=10, dtype=jnp.float32)
    assert model.stage_blocks == blocks
    assert model.expansion == expansion
    specs = dict((n, s) for n, s, _ in model._param_specs())
    assert specs["fc.weight"] == (512 * expansion, 10)
    assert f"layer4.{blocks[3]-1}.conv2.weight" in specs
    assert "layer3.0.downsample.0.weight" in specs


def test_unsupported_depth_raises():
    with pytest.raises(ValueError):
        ResNet(depth=77)


def test_resnet152_spec():
    import jax

    from semanticlens_tpu.models.resnet import ResNet

    m = ResNet(depth=152, num_classes=10)
    assert m.stage_blocks == (3, 8, 36, 3) and m.bottleneck
    assert "layer3.35" in " ".join(m.module_names)
    # spec-level check only (full init of 152 layers is slow on CPU):
    specs = {name: shape for name, shape, _ in m._param_specs()}
    assert specs["layer3.35.conv3.weight"] == (1, 1, 256, 1024)
