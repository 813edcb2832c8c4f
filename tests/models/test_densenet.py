"""DenseNet subject family: torchvision-name parity, taps, checkpoint conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import DenseNet


@pytest.fixture(scope="module")
def d121():
    model = DenseNet(depth=121, num_classes=10, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    return model


def test_module_names_torchvision_compatible(d121):
    for name in [
        "features.conv0",
        "features.denseblock1.denselayer1.conv2",
        "features.denseblock3.denselayer24",
        "features.transition2.pool",
        "features.norm5",
        "classifier",
    ]:
        assert name in d121.module_names, name
    # block 1 has exactly 6 denselayers in densenet121
    assert "features.denseblock1.denselayer7" not in d121.module_names


def test_channel_arithmetic():
    # torchvision feature widths: 121→1024, 161→2208, 169→1664, 201→1920
    for depth, want in [(121, 1024), (161, 2208), (169, 1664), (201, 1920)]:
        assert DenseNet(depth=depth).num_features == want, depth


def test_forward_shapes_and_taps(d121):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32))
    logits, taps = d121.apply(
        d121.params,
        x,
        ("features.pool0", "features.denseblock1", "features.transition1.pool",
         "features.denseblock2.denselayer3", "features.norm5"),
    )
    assert logits.shape == (2, 10)
    assert taps["features.pool0"].shape == (2, 56, 56, 64)
    assert taps["features.denseblock1"].shape == (2, 56, 56, 256)        # 64 + 6*32
    assert taps["features.transition1.pool"].shape == (2, 28, 28, 128)   # halved, pooled
    assert taps["features.denseblock2.denselayer3"].shape == (2, 28, 28, 32)  # NEW features only
    assert taps["features.norm5"].shape == (2, 7, 7, 1024)


def test_headless():
    m = DenseNet(depth=121, num_classes=0, dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(1))
    assert "classifier" not in m.module_names
    out, _ = m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert out.shape == (1, 1024)


def test_unsupported_depth():
    with pytest.raises(ValueError):
        DenseNet(depth=100)


def _torch_densenet_twin(torch, nn, g, block_config=(2, 2), growth=8, init_feats=16, num_classes=7):
    """Hand-built torchvision-architecture DenseNet (torchvision not installed
    in this image; this mirrors torchvision.models.densenet._DenseLayer /
    _Transition exactly, including parameter names)."""

    class DenseLayer(nn.Module):
        def __init__(self, c_in):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(c_in)
            self.relu1 = nn.ReLU()
            self.conv1 = nn.Conv2d(c_in, 4 * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(4 * growth)
            self.relu2 = nn.ReLU()
            self.conv2 = nn.Conv2d(4 * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            return self.conv2(self.relu2(self.norm2(self.conv1(self.relu1(self.norm1(x))))))

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            feats = nn.Sequential()
            feats.add_module("conv0", nn.Conv2d(3, init_feats, 7, stride=2, padding=3, bias=False))
            feats.add_module("norm0", nn.BatchNorm2d(init_feats))
            feats.add_module("relu0", nn.ReLU())
            feats.add_module("pool0", nn.MaxPool2d(3, stride=2, padding=1))
            c = init_feats
            for bi, n_layers in enumerate(block_config, start=1):
                block = nn.Module()
                for li in range(1, n_layers + 1):
                    block.add_module(f"denselayer{li}", DenseLayer(c))
                    c += growth
                feats.add_module(f"denseblock{bi}", block)
                if bi != len(block_config):
                    trans = nn.Sequential()
                    trans.norm = nn.BatchNorm2d(c)
                    trans.relu = nn.ReLU()
                    trans.conv = nn.Conv2d(c, c // 2, 1, bias=False)
                    trans.pool = nn.AvgPool2d(2, 2)
                    feats.add_module(f"transition{bi}", trans)
                    c = c // 2
            feats.add_module("norm5", nn.BatchNorm2d(c))
            self.features = feats
            self.classifier = nn.Linear(c, num_classes)
            self._block_config = block_config

        def forward(self, x):
            f = self.features
            x = f.pool0(f.relu0(f.norm0(f.conv0(x))))
            for bi, n_layers in enumerate(self._block_config, start=1):
                block = getattr(f, f"denseblock{bi}")
                for li in range(1, n_layers + 1):
                    x = torch.cat([x, getattr(block, f"denselayer{li}")(x)], 1)
                if bi != len(self._block_config):
                    t = getattr(f, f"transition{bi}")
                    x = t.pool(t.conv(t.relu(t.norm(x))))
            x = torch.relu(f.norm5(x))
            x = torch.flatten(torch.nn.functional.adaptive_avg_pool2d(x, 1), 1)
            return self.classifier(x)

    twin = Twin()
    with torch.no_grad():
        for mod in twin.modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                fan_in = mod.weight.shape[1] * (
                    mod.weight.shape[2] * mod.weight.shape[3] if mod.weight.ndim == 4 else 1
                )
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g) * fan_in**-0.5)
                if mod.bias is not None:
                    mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.02)
            elif isinstance(mod, nn.BatchNorm2d):
                mod.weight.copy_(1 + 0.1 * torch.randn(mod.weight.shape, generator=g))
                mod.bias.copy_(0.1 * torch.randn(mod.bias.shape, generator=g))
                mod.running_mean.copy_(0.1 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    twin.eval()
    return twin


def test_torch_checkpoint_conversion_parity():
    """Tiny-config torch twin (same names, same wiring) must match after
    conversion; full-size densenet121 is covered structurally by
    test_channel_arithmetic + the shared conversion path."""
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    twin = _torch_densenet_twin(torch, torch.nn, g)

    x = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        want = twin(x).numpy()

    model = DenseNet(depth=121, num_classes=7, dtype=jnp.float32)
    # Shrink to the twin's config so param specs line up.
    model.growth_rate, model.block_config, model.num_init_features = 8, (2, 2), 16
    model._blocks = [(1, 2, 16), (2, 2, 16)]
    model.num_features = 32  # (16 + 2*8)//2 + 2*8
    model.module_names = tuple(model._enumerate_module_names())
    params = model.load_torch_state_dict(twin.state_dict())
    got, _ = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())


def test_densenet_collect_e2e(tmp_path):
    """The family plugs into the Collect engine like every other subject."""
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = DenseNet(depth=121, num_classes=4, dtype=jnp.float32)
    # Tiny config for test speed (same code path as the full model).
    model.growth_rate, model.block_config, model.num_init_features = 4, (2, 2), 8
    model._blocks = [(1, 2, 8), (2, 2, 8)]
    model.num_features = 16
    model.module_names = tuple(model._enumerate_module_names())
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "densenet-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(10, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.denseblock1"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=5)
    assert cache["features.denseblock1"].activations.shape == (16, 3)
