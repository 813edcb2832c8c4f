"""Structural, tap, and torch-twin parity tests for EfficientNetV2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.efficientnet import EfficientNetV2


@pytest.fixture(scope="module")
def v2s():
    model = EfficientNetV2("v2_s", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_torchvision_compatible(v2s):
    model, _ = v2s
    # fused stage: one dense conv (block.0), projection only when expanding
    assert "features.1.0.block.0.0" in model.module_names  # expand=1: single conv
    assert "features.1.0.block.1" not in model.module_names
    assert "features.2.0.block.1.0" in model.module_names  # expand=4: fused + proj
    assert not any(".block.0.avgpool" in n for n in model.module_names)
    # fused blocks have no SE
    assert not any("features.2.0.block" in n and ".fc1" in n for n in model.module_names)
    # MBConv stage keeps V1's grammar incl. SE
    assert "features.4.0.block.1.0" in model.module_names  # depthwise CNA
    assert "features.4.0.block.2.fc1" in model.module_names
    assert "features.6.14.block.3.1" in model.module_names  # 15th block projection BN
    assert "features.7.0" in model.module_names  # 1280-d head conv
    validate_layers(model, ["features.5", "features.3.2.block.0"])
    with pytest.raises(ValueError):
        EfficientNetV2("v2_xl")


def test_forward_shapes_and_variants(v2s):
    model, params = v2s
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(params, jnp.asarray(x), ("features.3", "features.6", "avgpool"))
    assert logits.shape == (2, 10)
    assert taps["features.3"].shape == (2, 8, 8, 64)
    assert taps["features.6"].shape == (2, 2, 2, 256)
    assert taps["avgpool"].shape == (2, 1, 1, 1280)
    m = EfficientNetV2("v2_m", num_classes=0)
    assert m.stages[-1][-1].c_out == 512 and m.num_features == 1280
    lg = EfficientNetV2("v2_l", num_classes=0)
    assert lg.stem_ch == 32 and lg.stages[-1][-1].c_out == 640


def test_every_v2_name_is_tapped_batch_leading(v2s):
    model, params = v2s
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    names = tuple(model.module_names)
    _, taps = model.apply(params, x, tap_names=names)
    missing = [n for n in names if n not in taps]
    assert not missing, f"advertised but never tapped: {missing}"
    bad = {n: tuple(v.shape) for n, v in taps.items() if v.shape[0] != 2}
    assert not bad, bad


def _build_torch_twin(torch, num_classes=5):
    """EfficientNetV2-S twin with torchvision's exact module tree/names."""
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def cna(cin, cout, k, stride=1, groups=1, act=True):
        layers = [nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2,
                            groups=groups, bias=False), nn.BatchNorm2d(cout, eps=1e-3)]
        if act:
            layers.append(nn.SiLU())
        return nn.Sequential(*layers)

    class SE(nn.Module):
        def __init__(self, ch, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(ch, squeeze, 1)
            self.activation = nn.SiLU()
            self.fc2 = nn.Conv2d(squeeze, ch, 1)
            self.scale_activation = nn.Sigmoid()

        def forward(self, x):
            return x * self.scale_activation(self.fc2(self.activation(self.fc1(self.avgpool(x)))))

    class Residual(nn.Module):
        def __init__(self, block, residual):
            super().__init__()
            self.block = block
            self.stochastic_depth = nn.Identity()
            self.residual = residual

        def forward(self, x):
            h = self.stochastic_depth(self.block(x))
            return x + h if self.residual else h

    def fused(cin, cout, expand, stride):
        cmid = cin * expand
        if cmid != cin:
            block = nn.Sequential(cna(cin, cmid, 3, stride), cna(cmid, cout, 1, act=False))
        else:
            block = nn.Sequential(cna(cin, cout, 3, stride))
        return Residual(block, stride == 1 and cin == cout)

    def mbconv(cin, cout, expand, stride):
        cmid = cin * expand
        block = nn.Sequential(
            cna(cin, cmid, 1),
            cna(cmid, cmid, 3, stride, groups=cmid),
            SE(cmid, max(1, cin // 4)),
            cna(cmid, cout, 1, act=False),
        )
        return Residual(block, stride == 1 and cin == cout)

    rows = (
        (True, 1, 1, 24, 24, 2), (True, 4, 2, 24, 48, 4), (True, 4, 2, 48, 64, 4),
        (False, 4, 2, 64, 128, 6), (False, 6, 1, 128, 160, 9), (False, 6, 2, 160, 256, 15),
    )

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            feats = [cna(3, 24, 3, 2)]
            for is_fused, expand, stride, cin, cout, layers in rows:
                stage = []
                for j in range(layers):
                    c = cin if j == 0 else cout
                    s = stride if j == 0 else 1
                    stage.append(fused(c, cout, expand, s) if is_fused
                                 else mbconv(c, cout, expand, s))
                feats.append(nn.Sequential(*stage))
            feats.append(cna(256, 1280, 1))
            self.features = nn.Sequential(*feats)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(nn.Dropout(0.0), nn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    net = Net()
    for m in net.modules():
        if isinstance(m, nn.Conv2d):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.03)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.03)
        elif isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(1.0 + 0.1 * torch.randn(m.weight.shape, generator=g))
                m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape, generator=g))
                m.running_var.copy_((1.0 + 0.1 * torch.randn(m.running_var.shape, generator=g)).abs())
        elif isinstance(m, nn.Linear):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.02)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.02)
    return net.eval()


def test_efficientnet_v2_torch_parity():
    """Full-depth EfficientNetV2-S twin (fused-MBConv early stages, MBConv
    late stages, 1280-d head, BN eps 1e-3) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()
    m = EfficientNetV2("v2_s", num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("features.4",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["features.4"].shape == (2, 4, 4, 128)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = EfficientNetV2("v2_s", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "effv2s-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.4"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["features.4"].activations.shape == (128, 3)
