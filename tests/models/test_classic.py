"""Structural, tap, and torch-twin parity tests for AlexNet + SqueezeNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.classic import AlexNet, SqueezeNet


# --------------------------------------------------------------------- alexnet
def test_alexnet_module_names():
    m = AlexNet(num_classes=10, dtype=jnp.float32)
    for name in ["features.0", "features.10", "features.12", "avgpool",
                 "classifier.0", "classifier.6"]:
        assert name in m.module_names, name
    assert "features.13" not in m.module_names
    headless = AlexNet(num_classes=0)
    assert not any(n.startswith("classifier") for n in headless.module_names)
    validate_layers(m, ["features.6"])
    with pytest.raises(ValueError):
        validate_layers(m, ["features.99"])


def test_alexnet_forward_shapes():
    m = AlexNet(num_classes=10, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32)
    logits, taps = m.apply(params, jnp.asarray(x), ("features.0", "features.12", "avgpool"))
    assert logits.shape == (2, 10)
    assert taps["features.0"].shape == (2, 55, 55, 64)
    assert taps["features.12"].shape == (2, 6, 6, 256)
    assert taps["avgpool"].shape == (2, 6, 6, 256)
    with pytest.raises(ValueError, match="6x6"):
        m.apply(params, jnp.zeros((1, 75, 75, 3), jnp.float32))


def _alexnet_twin(torch, num_classes=5):
    nn = torch.nn
    g = torch.Generator().manual_seed(0)
    net = nn.Sequential()
    net.features = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(), nn.MaxPool2d(3, 2),
    )
    net.avgpool = nn.AdaptiveAvgPool2d((6, 6))
    net.classifier = nn.Sequential(
        nn.Dropout(0.0), nn.Linear(9216, 4096), nn.ReLU(),
        nn.Dropout(0.0), nn.Linear(4096, 4096), nn.ReLU(),
        nn.Linear(4096, num_classes),
    )
    for m in net.modules():
        if isinstance(m, (nn.Conv2d, nn.Linear)):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.02)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.02)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = net.features
            self.avgpool = net.avgpool
            self.classifier = net.classifier

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return Net().eval()


def test_alexnet_torch_parity():
    """Full AlexNet twin (11×11/s4 stem, channel-major flatten into the
    9216→4096 classifier) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _alexnet_twin(torch)
    x = torch.randn(2, 3, 224, 224, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()
    m = AlexNet(num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, _ = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


# ------------------------------------------------------------------ squeezenet
def test_squeezenet_module_names_and_shapes():
    m = SqueezeNet("1_0", num_classes=10, dtype=jnp.float32)
    for name in ["features.0", "features.3.squeeze", "features.12.expand3x3",
                 "classifier.1", "classifier.3"]:
        assert name in m.module_names, name
    v11 = SqueezeNet("1_1", num_classes=10, dtype=jnp.float32)
    assert "features.3.squeeze" in v11.module_names  # fires start at 3 in both
    assert "features.12.expand1x1_activation" in v11.module_names
    with pytest.raises(ValueError):
        SqueezeNet("2_0")

    params = v11.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(2, 96, 96, 3)).astype(np.float32)
    logits, taps = v11.apply(params, jnp.asarray(x), ("features.3", "classifier.3"))
    assert logits.shape == (2, 10)
    assert taps["features.3"].shape[-1] == 128  # expand1x1 + expand3x3
    assert taps["classifier.3"].shape == (2, 1, 1, 10)
    headless = SqueezeNet("1_1", num_classes=0, dtype=jnp.float32)
    feats, _ = headless.apply(headless.init(jax.random.PRNGKey(1)),
                              jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert feats.shape == (1, 512)


def _squeezenet_twin(torch, version, num_classes=5):
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    class Fire(nn.Module):
        def __init__(self, cin, sq, e1, e3):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, sq, 1)
            self.squeeze_activation = nn.ReLU()
            self.expand1x1 = nn.Conv2d(sq, e1, 1)
            self.expand1x1_activation = nn.ReLU()
            self.expand3x3 = nn.Conv2d(sq, e3, 3, padding=1)
            self.expand3x3_activation = nn.ReLU()

        def forward(self, x):
            s = self.squeeze_activation(self.squeeze(x))
            return torch.cat([
                self.expand1x1_activation(self.expand1x1(s)),
                self.expand3x3_activation(self.expand3x3(s)),
            ], 1)

    if version == "1_0":
        feats = [
            nn.Conv2d(3, 96, 7, 2), nn.ReLU(), nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(96, 16, 64, 64), Fire(128, 16, 64, 64), Fire(128, 32, 128, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
            Fire(384, 48, 192, 192), Fire(384, 64, 256, 256),
            nn.MaxPool2d(3, 2, ceil_mode=True), Fire(512, 64, 256, 256),
        ]
    else:
        feats = [
            nn.Conv2d(3, 64, 3, 2), nn.ReLU(), nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(64, 16, 64, 64), Fire(128, 16, 64, 64),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(128, 32, 128, 128), Fire(256, 32, 128, 128),
            nn.MaxPool2d(3, 2, ceil_mode=True),
            Fire(256, 48, 192, 192), Fire(384, 48, 192, 192),
            Fire(384, 64, 256, 256), Fire(512, 64, 256, 256),
        ]

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*feats)
            self.classifier = nn.Sequential(
                nn.Dropout(0.0), nn.Conv2d(512, num_classes, 1), nn.ReLU(),
                nn.AdaptiveAvgPool2d((1, 1)),
            )

        def forward(self, x):
            return torch.flatten(self.classifier(self.features(x)), 1)

    net = Net()
    for m in net.modules():
        if isinstance(m, nn.Conv2d):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)
    return net.eval()


@pytest.mark.parametrize("version", ["1_0", "1_1"])
def test_squeezenet_torch_parity(version):
    """Full SqueezeNet twin (padding-free stem, ceil-mode pools, Fire
    concat order, conv classifier) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _squeezenet_twin(torch, version)
    x = torch.randn(2, 3, 128, 128, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()
    m = SqueezeNet(version, num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, _ = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_squeezenet_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_max

    model = SqueezeNet("1_1", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "squeezenet-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 96, 96, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.6"], num_samples=3,
        aggregate_fn=aggregate_conv_max, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["features.6"].activations.shape == (256, 3)
