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


def test_resnet_d_variant_torch_parity():
    """timm-style ResNet-D (deep stem, avg-pool downsample): a torch model
    with timm parameter names converts and matches numerically."""
    import pytest as _pytest

    torch = _pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.models.resnet import ResNet

    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def randn_(t, scale=0.1):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    def bn(c):
        m = nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            m.weight.copy_(torch.rand(c, generator=g) + 0.5)
            m.bias.copy_(torch.randn(c, generator=g) * 0.1)
            m.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(c, generator=g) + 0.3)
        return m

    class BasicD(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
            self.bn1 = bn(cout)
            self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
            self.bn2 = bn(cout)
            randn_(self.conv1.weight), randn_(self.conv2.weight)
            if stride != 1 or cin != cout:
                pool = nn.AvgPool2d(stride, stride) if stride > 1 else nn.Identity()
                conv = nn.Conv2d(cin, cout, 1, bias=False)
                randn_(conv.weight)
                self.downsample = nn.Sequential(pool, conv, bn(cout))
            else:
                self.downsample = None

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = self.bn2(self.conv2(h))
            return torch.relu(h + idn)

    class ResNet18D(nn.Module):
        def __init__(self):
            super().__init__()
            sw = 32
            self.conv1 = nn.Sequential(
                nn.Conv2d(3, sw, 3, stride=2, padding=1, bias=False), bn(sw), nn.ReLU(),
                nn.Conv2d(sw, sw, 3, padding=1, bias=False), bn(sw), nn.ReLU(),
                nn.Conv2d(sw, 64, 3, padding=1, bias=False),
            )
            for i in (0, 3, 6):
                randn_(self.conv1[i].weight)
            self.bn1 = bn(64)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = nn.Sequential(BasicD(64, 64, 1), BasicD(64, 64, 1))
            self.layer2 = nn.Sequential(BasicD(64, 128, 2), BasicD(128, 128, 1))
            self.layer3 = nn.Sequential(BasicD(128, 256, 2), BasicD(256, 256, 1))
            self.layer4 = nn.Sequential(BasicD(256, 512, 2), BasicD(512, 512, 1))
            self.fc = nn.Linear(512, 10)
            randn_(self.fc.weight), randn_(self.fc.bias, 0.02)

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(x.mean(dim=(2, 3)))

    tmodel = ResNet18D().eval()
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = ResNet(depth=18, num_classes=10, dtype=jnp.float32, variant="d")
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("layer4",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
    assert taps["layer4"].shape == (2, 2, 2, 512)


def test_resnet_d_variant_validation():
    from semanticlens_tpu.models.resnet import ResNet

    with pytest.raises(ValueError):
        ResNet(variant="c")


def test_resnext_spec_shapes():
    """resnext50_32x4d widths follow torchvision's int(planes*4/64)*32 formula."""
    m = ResNet(depth=50, num_classes=10, groups=32, width_per_group=4)
    specs = {name: shape for name, shape, _ in m._param_specs()}
    # stage1: planes=64 → width=128; grouped conv2 stores in_ch/groups=4.
    assert specs["layer1.0.conv1.weight"] == (1, 1, 64, 128)
    assert specs["layer1.0.conv2.weight"] == (3, 3, 4, 128)
    assert specs["layer1.0.conv3.weight"] == (1, 1, 128, 256)
    # stage4: planes=512 → width=1024; block output stays 2048.
    assert specs["layer4.0.conv2.weight"] == (3, 3, 32, 1024)
    assert specs["fc.weight"] == (2048, 10)


def test_wide_resnet_spec_shapes():
    """wide_resnet50_2 doubles the bottleneck inner width, not the output."""
    m = ResNet(depth=50, num_classes=10, width_per_group=128)
    specs = {name: shape for name, shape, _ in m._param_specs()}
    assert specs["layer1.0.conv2.weight"] == (3, 3, 128, 128)
    assert specs["layer4.0.conv2.weight"] == (3, 3, 1024, 1024)
    assert specs["fc.weight"] == (2048, 10)


def test_groups_require_bottleneck():
    with pytest.raises(ValueError):
        ResNet(depth=18, groups=32, width_per_group=4)
    with pytest.raises(ValueError):
        ResNet(depth=34, width_per_group=128)


@pytest.mark.parametrize(
    "groups,base_width",
    [(32, 4), (1, 128)],  # resnext50_32x4d / wide_resnet50_2
    ids=["resnext50_32x4d", "wide_resnet50_2"],
)
def test_grouped_bottleneck_torch_parity(groups, base_width):
    """Full-depth ResNeXt-50 / Wide-ResNet-50 torch twins (torchvision
    Bottleneck semantics: stride on conv2, grouped 3×3) convert by relayout
    and match numerically."""
    torch = pytest.importorskip("torch")

    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def randn_(t, scale=0.05):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    def bn(c):
        m = nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            m.weight.copy_(torch.rand(c, generator=g) + 0.5)
            m.bias.copy_(torch.randn(c, generator=g) * 0.1)
            m.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
            m.running_var.copy_(torch.rand(c, generator=g) + 0.3)
        return m

    class Bottleneck(nn.Module):
        def __init__(self, cin, planes, stride):
            super().__init__()
            width = int(planes * base_width / 64) * groups
            self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
            self.bn1 = bn(width)
            self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, groups=groups, bias=False)
            self.bn2 = bn(width)
            self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = bn(planes * 4)
            randn_(self.conv1.weight), randn_(self.conv2.weight), randn_(self.conv3.weight)
            if stride != 1 or cin != planes * 4:
                conv = nn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False)
                randn_(conv.weight)
                self.downsample = nn.Sequential(conv, bn(planes * 4))
            else:
                self.downsample = None

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            h = torch.relu(self.bn1(self.conv1(x)))
            h = torch.relu(self.bn2(self.conv2(h)))
            h = self.bn3(self.conv3(h))
            return torch.relu(h + idn)

    def stage(cin, planes, n_blocks, stride):
        blocks = [Bottleneck(cin, planes, stride)]
        blocks += [Bottleneck(planes * 4, planes, 1) for _ in range(n_blocks - 1)]
        return nn.Sequential(*blocks)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            randn_(self.conv1.weight)
            self.bn1 = bn(64)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = stage(64, 64, 3, 1)
            self.layer2 = stage(256, 128, 4, 2)
            self.layer3 = stage(512, 256, 6, 2)
            self.layer4 = stage(1024, 512, 3, 2)
            self.fc = nn.Linear(2048, 5)
            randn_(self.fc.weight), randn_(self.fc.bias, 0.02)

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(x.mean(dim=(2, 3)))

    tmodel = Net().eval()
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = ResNet(depth=50, num_classes=5, dtype=jnp.float32, groups=groups, width_per_group=base_width)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("layer4",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    assert taps["layer4"].shape == (2, 2, 2, 2048)
