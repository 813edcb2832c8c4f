"""VGG subject family: torchvision-name parity, taps, checkpoint conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import VGG


@pytest.fixture(scope="module")
def v16():
    model = VGG(depth=16, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    return model


def test_module_names_torchvision_compatible(v16):
    # torchvision vgg16 Sequential indices: convs at 0,2,5,7,10,12,14,...
    for name in ["features.0", "features.2", "features.30", "avgpool", "classifier.6"]:
        assert name in v16.module_names, name
    assert "features.31" not in v16.module_names  # vgg16 features has 31 entries (0..30)


def test_forward_shapes_and_taps(v16):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32))
    logits, taps = v16.apply(v16.params, x, ("features.0", "features.30", "avgpool", "classifier.0"))
    assert logits.shape == (2, 10)
    assert taps["features.0"].shape == (2, 224, 224, 64)
    assert taps["features.30"].shape == (2, 7, 7, 512)   # final maxpool
    assert taps["avgpool"].shape == (2, 7, 7, 512)
    assert taps["classifier.0"].shape == (2, 4096)


def test_headless_and_small_inputs():
    m = VGG(depth=11, num_classes=0, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(1))
    assert "classifier.6" not in m.module_names
    out, _ = m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert out.shape == (1, 4096)
    with pytest.raises(ValueError, match="7x7"):
        m.apply(p, jnp.zeros((1, 96, 96, 3), jnp.float32))  # pools to 3x3


def test_bn_variant_param_specs():
    m = VGG(depth=13, num_classes=5, batch_norm=True, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(2))
    assert "features.1.running_mean" in p  # BN right after conv 0
    out, taps = m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32), ("features.1",))
    assert out.shape == (1, 5) and taps["features.1"].shape[-1] == 64


def test_unsupported_depth():
    with pytest.raises(ValueError):
        VGG(depth=12)


def test_torch_checkpoint_conversion_parity():
    """Full-architecture torchvision-style VGG-11 twin (random weights incl.
    the channel-major classifier flatten) must match after conversion."""
    torch = pytest.importorskip("torch")
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    layers, cin = [], 3
    for item in cfg:
        if item == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers += [nn.Conv2d(cin, item, 3, padding=1), nn.ReLU(inplace=False)]
            cin = item
    torch_model = nn.Sequential()
    torch_model.features = nn.Sequential(*layers)
    torch_model.avgpool = nn.AdaptiveAvgPool2d((7, 7))
    torch_model.classifier = nn.Sequential(
        nn.Linear(512 * 7 * 7, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout(),
        nn.Linear(4096, 13),
    )
    with torch.no_grad():
        for mod in torch_model.modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                fan_in = mod.weight.shape[1] * (
                    mod.weight.shape[2] * mod.weight.shape[3] if mod.weight.ndim == 4 else 1
                )
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g) * fan_in**-0.5)
                mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.02)
    torch_model.eval()

    def torch_fwd(x):
        h = torch_model.features(x)
        h = torch_model.avgpool(h)
        return torch_model.classifier(torch.flatten(h, 1))

    x = torch.randn(2, 3, 224, 224, generator=g)
    with torch.no_grad():
        want = torch_fwd(x).numpy()

    model = VGG(depth=11, num_classes=13, dtype=jnp.float32)
    params = model.load_torch_state_dict(torch_model.state_dict())
    got, _ = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())


def test_vgg_collect_e2e(tmp_path):
    """The family plugs into the Collect engine like every other subject."""
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = VGG(depth=11, num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "vgg11-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(10, 224, 224, 3)).astype(np.float32), name="v"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.18"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=5)
    assert cache["features.18"].activations.shape == (512, 3)
