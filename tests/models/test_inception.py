"""Structural, tap, and torch-twin parity tests for the Inception family."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.inception import GoogLeNet, InceptionV3


@pytest.fixture(scope="module")
def gnet():
    model = GoogLeNet(num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_torchvision_compatible(gnet):
    model, _ = gnet
    for name in ["conv1", "conv1.conv", "conv1.bn", "maxpool1", "conv3",
                 "inception3a", "inception3a.branch1", "inception3a.branch2.0",
                 "inception4e.branch3.1", "inception5b.branch4.1", "maxpool4",
                 "avgpool", "dropout", "fc"]:
        assert name in model.module_names, name


def test_forward_shapes_and_taps(gnet):
    model, params = gnet
    x = np.random.default_rng(0).normal(size=(2, 96, 96, 3)).astype(np.float32)
    logits, taps = model.apply(
        params, jnp.asarray(x), tap_names=("inception3a", "inception4e", "inception5b", "avgpool")
    )
    assert logits.shape == (2, 10)
    # 96 → 48 (conv1) → 24 (mp1, ceil) → 12 (mp2) → 6 (mp3) → 3 (mp4)
    assert taps["inception3a"].shape == (2, 12, 12, 256)
    assert taps["inception4e"].shape == (2, 6, 6, 832)
    assert taps["inception5b"].shape == (2, 3, 3, 1024)
    assert taps["avgpool"].shape == (2, 1, 1, 1024)


def test_headless(gnet):
    model = GoogLeNet(num_classes=0, dtype=jnp.float32)
    assert "fc" not in model.module_names
    params = model.init(jax.random.PRNGKey(1))
    feats, _ = model.apply(params, jnp.zeros((1, 96, 96, 3), jnp.float32))
    assert feats.shape == (1, 1024)


def test_validate_layers(gnet):
    model, _ = gnet
    validate_layers(model, ["inception4a", "inception3b.branch2.1"])
    with pytest.raises(ValueError):
        validate_layers(model, ["inception9z"])


def _build_torch_twin(torch, num_classes=7):
    """Full torchvision-GoogLeNet twin with deterministic weights."""
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def randn_(t, scale=0.05):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=0.001).eval()
            randn_(self.conv.weight)
            with torch.no_grad():
                self.bn.weight.copy_(torch.rand(cout, generator=g) + 0.5)
                self.bn.bias.copy_(torch.randn(cout, generator=g) * 0.1)
                self.bn.running_mean.copy_(torch.randn(cout, generator=g) * 0.2)
                self.bn.running_var.copy_(torch.rand(cout, generator=g) + 0.3)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class Inception(nn.Module):
        def __init__(self, cin, c1, c3r, c3, c5r, c5, cp):
            super().__init__()
            self.branch1 = BasicConv2d(cin, c1, 1)
            self.branch2 = nn.Sequential(BasicConv2d(cin, c3r, 1), BasicConv2d(c3r, c3, 3, padding=1))
            self.branch3 = nn.Sequential(BasicConv2d(cin, c5r, 1), BasicConv2d(c5r, c5, 3, padding=1))
            self.branch4 = nn.Sequential(
                nn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True), BasicConv2d(cin, cp, 1)
            )

        def forward(self, x):
            return torch.cat([self.branch1(x), self.branch2(x), self.branch3(x), self.branch4(x)], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = BasicConv2d(3, 64, 7, stride=2, padding=3)
            self.maxpool1 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.conv2 = BasicConv2d(64, 64, 1)
            self.conv3 = BasicConv2d(64, 192, 3, padding=1)
            self.maxpool2 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
            self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
            self.maxpool3 = nn.MaxPool2d(3, stride=2, ceil_mode=True)
            self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
            self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
            self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
            self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
            self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
            self.maxpool4 = nn.MaxPool2d(2, stride=2, ceil_mode=True)
            self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
            self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)
            self.fc = nn.Linear(1024, num_classes)
            randn_(self.fc.weight), randn_(self.fc.bias, 0.02)

        def forward(self, x):
            x = self.maxpool1(self.conv1(x))
            x = self.maxpool2(self.conv3(self.conv2(x)))
            x = self.maxpool3(self.inception3b(self.inception3a(x)))
            x = self.inception4e(self.inception4d(self.inception4c(self.inception4b(self.inception4a(x)))))
            x = self.inception5b(self.inception5a(self.maxpool4(x)))
            return self.fc(x.mean(dim=(2, 3)))

    return Net().eval()


def test_googlenet_torch_parity():
    """Full-depth torch twin converts by relayout and matches numerically,
    including the ceil-mode pools."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 96, 96, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = GoogLeNet(num_classes=7, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("inception4e",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    assert taps["inception4e"].shape[-1] == 832


def test_transform_input_matches_torch_formula():
    torch = pytest.importorskip("torch")
    m = GoogLeNet(num_classes=0, transform_input=True, dtype=jnp.float32)
    x = np.random.default_rng(2).normal(size=(1, 8, 8, 3)).astype(np.float32)
    got = np.asarray(m._transform_input(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ch = [
        torch.unsqueeze(xt[:, 0], 1) * (0.229 / 0.5) + (0.485 - 0.5) / 0.5,
        torch.unsqueeze(xt[:, 1], 1) * (0.224 / 0.5) + (0.456 - 0.5) / 0.5,
        torch.unsqueeze(xt[:, 2], 1) * (0.225 / 0.5) + (0.406 - 0.5) / 0.5,
    ]
    want = torch.cat(ch, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_ceil_mode_max_pool_matches_torch():
    """layers.max_pool(ceil_mode=True) reproduces torch across odd sizes."""
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.models.layers import max_pool

    rng = np.random.default_rng(3)
    for size in (7, 10, 11, 23, 48):
        for window, stride, pad in ((3, 2, 0), (2, 2, 0), (3, 2, 1), (3, 1, 1)):
            x = rng.normal(size=(1, size, size, 4)).astype(np.float32)
            want = torch.nn.MaxPool2d(window, stride=stride, padding=pad, ceil_mode=True)(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
            got = np.asarray(
                max_pool(jnp.asarray(x), window=window, stride=stride, padding=pad, ceil_mode=True)
            )
            np.testing.assert_allclose(got, want, err_msg=f"size={size} k={window} s={stride} p={pad}")


# ---------------------------------------------------------------------------
# Inception v3
# ---------------------------------------------------------------------------


def test_v3_module_names_torchvision_compatible():
    m = InceptionV3(num_classes=10, dtype=jnp.float32)
    for name in ["Conv2d_1a_3x3", "Conv2d_1a_3x3.conv", "maxpool1", "Conv2d_4a_3x3",
                 "Mixed_5b", "Mixed_5b.branch5x5_2", "Mixed_6b.branch7x7_3",
                 "Mixed_6e.branch7x7dbl_5", "Mixed_7a.branch7x7x3_4",
                 "Mixed_7c.branch3x3dbl_3b", "Mixed_7c.branch_pool",
                 "avgpool", "dropout", "fc"]:
        assert name in m.module_names, name
    assert "AuxLogits" not in " ".join(m.module_names)


def test_v3_forward_shapes_and_taps():
    m = InceptionV3(num_classes=10, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).normal(size=(1, 128, 128, 3)).astype(np.float32)
    logits, taps = m.apply(params, jnp.asarray(x), tap_names=("Mixed_5d", "Mixed_6e", "Mixed_7c"))
    assert logits.shape == (1, 10)
    assert taps["Mixed_5d"].shape[-1] == 288
    assert taps["Mixed_6e"].shape[-1] == 768
    assert taps["Mixed_7c"].shape[-1] == 2048


def test_v3_headless():
    m = InceptionV3(num_classes=0, dtype=jnp.float32)
    assert "fc" not in m.module_names
    params = m.init(jax.random.PRNGKey(1))
    feats, _ = m.apply(params, jnp.zeros((1, 128, 128, 3), jnp.float32))
    assert feats.shape == (1, 2048)


def _build_v3_torch_twin(torch, num_classes=6):
    """Full torchvision-InceptionV3 twin (no aux) with deterministic weights."""
    nn = torch.nn
    F = torch.nn.functional
    g = torch.Generator().manual_seed(0)

    def randn_(t, scale=0.05):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, k, stride=1, padding=0):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=padding, bias=False)
            self.bn = nn.BatchNorm2d(cout, eps=0.001).eval()
            randn_(self.conv.weight)
            with torch.no_grad():
                self.bn.weight.copy_(torch.rand(cout, generator=g) + 0.5)
                self.bn.bias.copy_(torch.randn(cout, generator=g) * 0.1)
                self.bn.running_mean.copy_(torch.randn(cout, generator=g) * 0.2)
                self.bn.running_var.copy_(torch.rand(cout, generator=g) + 0.3)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class InceptionA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, 1)
            self.branch5x5_1 = BasicConv2d(cin, 48, 1)
            self.branch5x5_2 = BasicConv2d(48, 64, 5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b5, b3, bp], 1)

    class InceptionB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, 3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class InceptionC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, 1)
            self.branch7x7_1 = BasicConv2d(cin, c7, 1)
            self.branch7x7_2 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, (7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, 1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, (1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b7, bd, bp], 1)

    class InceptionD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, 1)
            self.branch3x3_2 = BasicConv2d(192, 320, 3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, 1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, (1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, (7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, 3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class InceptionE(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 320, 1)
            self.branch3x3_1 = BasicConv2d(cin, 384, 1)
            self.branch3x3_2a = BasicConv2d(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, (3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, 1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, 3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, (3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            h = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(h), self.branch3x3_2b(h)], 1)
            h = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(h), self.branch3x3dbl_3b(h)], 1)
            bp = self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([b1, b3, bd, bp], 1)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, 3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, 3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, 3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, 1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, 3)
            self.Mixed_5b = InceptionA(192, 32)
            self.Mixed_5c = InceptionA(256, 64)
            self.Mixed_5d = InceptionA(288, 64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, 128)
            self.Mixed_6c = InceptionC(768, 160)
            self.Mixed_6d = InceptionC(768, 160)
            self.Mixed_6e = InceptionC(768, 192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048)
            self.fc = nn.Linear(2048, num_classes)
            randn_(self.fc.weight), randn_(self.fc.bias, 0.02)

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
            x = self.Mixed_6a(x)
            x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
            x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
            return self.fc(x.mean(dim=(2, 3)))

    return Net().eval()


def test_inception_v3_torch_parity():
    """Full-depth Inception-v3 torch twin (asymmetric 1x7/7x1 kernels, avg/max
    branch pools) converts by relayout and matches numerically."""
    torch = pytest.importorskip("torch")
    tmodel = _build_v3_torch_twin(torch)
    x = torch.randn(1, 3, 128, 128, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = InceptionV3(num_classes=6, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("Mixed_6e",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)
    assert taps["Mixed_6e"].shape[-1] == 768


def test_lrp_conservation_through_inception_block():
    """ε composite conserves relevance through a four-branch inception block:
    the concat VJP is an exact slice-split, so branch relevances recombine
    without loss (biases/means zeroed — they absorb relevance by design)."""
    from semanticlens_tpu.models.base import TapCollector
    from semanticlens_tpu.models.layers import lrp_composite

    model = GoogLeNet(num_classes=0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(4))
    params = {
        k: (jnp.zeros_like(v) if k.endswith((".bias", ".running_mean")) else v)
        for k, v in params.items()
    }

    def block(x):
        return model._inception(params, x, "inception3a", TapCollector(()))

    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 8, 8, 192)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(block, x)
        (r_in,) = vjp_fn(out)
    np.testing.assert_allclose(
        float(np.asarray(r_in, np.float64).sum()),
        float(np.asarray(out, np.float64).sum()),
        rtol=1e-2,
    )


def test_collect_e2e(tmp_path):
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = GoogLeNet(num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(6))
    model.name = "googlenet-test"
    ds = ArrayDataset(
        np.random.default_rng(7).normal(size=(10, 96, 96, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["inception3a"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=5)
    assert cache["inception3a"].activations.shape == (256, 3)
