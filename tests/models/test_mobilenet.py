"""MobileNetV2/V3 subject family: torchvision-name parity, FULL-architecture
torch-twin checkpoint conversion, LRP conservation, engine integration.

Unlike the larger families (which twin a shrunk slice), MobileNets are small
enough to hand-build the ENTIRE torchvision architecture in torch and assert
conversion parity at full depth/width."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import MobileNetV2, MobileNetV3


def test_head_widths():
    # torchvision: V2 classifier in 1280; V3-large 960→1280, V3-small 576→1024
    assert MobileNetV2().num_features == 1280
    assert MobileNetV3("large").num_features == 960
    assert MobileNetV3("large").hidden_ch == 1280
    assert MobileNetV3("small").num_features == 576
    assert MobileNetV3("small").hidden_ch == 1024


def test_block_counts():
    # torchvision: V2 has 17 InvertedResiduals, V3-large 15 bnecks, V3-small 11
    assert len(MobileNetV2().blocks) == 17
    assert len(MobileNetV3("large").blocks) == 15
    assert len(MobileNetV3("small").blocks) == 11


def test_width_mult_scaling():
    # torchvision mobilenet_v2 width_mult semantics: blocks scale, tail
    # floors at 1280 below 1.0 and scales above it.
    assert MobileNetV2(width_mult=0.5).head_ch == 1280
    assert MobileNetV2(width_mult=0.5).blocks[-1].c_out == 160
    assert MobileNetV2(width_mult=1.4).head_ch == 1792


def test_module_names_torchvision_compatible_v2():
    model = MobileNetV2(num_classes=10)
    for name in [
        "features.0.0",             # stem conv
        "features.1.conv.0.0",      # t=1 block: depthwise first
        "features.1.conv.1",        # ... then raw project Conv2d
        "features.1.conv.2",        # ... then raw BN
        "features.2.conv.0.0",      # t=6 block: expansion conv
        "features.2.conv.1.0",      # depthwise
        "features.2.conv.2",        # raw project
        "features.2.conv.3",        # raw BN
        "features.18.0",            # tail conv
        "classifier.1",
    ]:
        assert name in model.module_names, name
    assert "features.1.conv.3" not in model.module_names  # t=1 → 3 entries
    assert "features.19" not in model.module_names
    assert "avgpool" not in model.module_names  # torchvision V2 uses functional pooling


def test_module_names_torchvision_compatible_v3():
    large = MobileNetV3("large", num_classes=10)
    for name in [
        "features.0.0",
        "features.1.block.0.0",     # first bneck: expand==input → dw first
        "features.1.block.1.0",     # project CNA (conv)
        "features.1.block.1.1",     # project CNA (BN)
        "features.4.block.2.fc1",   # first SE block (24→72→40, k5)
        "features.4.block.2.scale_activation",
        "features.7.block.0.0",     # HS stage expansion
        "features.16.0",            # tail conv
        "avgpool",
        "classifier.0", "classifier.3",
    ]:
        assert name in large.module_names, name
    assert "features.1.block.2" not in large.module_names  # no expand, no SE
    assert "features.17" not in large.module_names

    small = MobileNetV3("small", num_classes=10)
    assert "features.1.block.1.fc1" in small.module_names  # first bneck HAS SE
    assert "features.12.0" in small.module_names           # tail after 11 bnecks
    assert "features.13" not in small.module_names


def test_forward_shapes_and_taps():
    model = MobileNetV2(num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32))
    logits, taps = model.apply(params, x, ("features.0", "features.4", "features.18"))
    assert logits.shape == (2, 10)
    assert taps["features.0"].shape == (2, 112, 112, 32)
    assert taps["features.4"].shape == (2, 28, 28, 32)
    assert taps["features.18"].shape == (2, 7, 7, 1280)

    model3 = MobileNetV3("small", num_classes=10, dtype=jnp.float32)
    p3 = model3.init(jax.random.PRNGKey(1))
    logits3, taps3 = model3.apply(p3, x, ("features.0", "features.12", "avgpool"))
    assert logits3.shape == (2, 10)
    assert taps3["features.0"].shape == (2, 112, 112, 16)
    assert taps3["features.12"].shape == (2, 7, 7, 576)
    assert taps3["avgpool"].shape == (2, 1, 1, 576)


def test_headless():
    for m in (MobileNetV2(num_classes=0, dtype=jnp.float32),
              MobileNetV3("small", num_classes=0, dtype=jnp.float32)):
        assert not any(n.startswith("classifier") for n in m.module_names)
        p = m.init(jax.random.PRNGKey(1))
        out, _ = m.apply(p, jnp.zeros((1, 64, 64, 3), jnp.float32))
        assert out.shape == (1, m.num_features)


def test_unknown_variant():
    with pytest.raises(ValueError):
        MobileNetV3("medium")


# --------------------------------------------------------------- torch twins
def _init_torch(twin, torch, nn, g):
    with torch.no_grad():
        for mod in twin.modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                fan_in = mod.weight.shape[1] * (
                    mod.weight.shape[2] * mod.weight.shape[3] if mod.weight.ndim == 4 else 1
                )
                mod.weight.copy_(torch.randn(mod.weight.shape, generator=g) * max(fan_in, 1) ** -0.5)
                if mod.bias is not None:
                    mod.bias.copy_(torch.randn(mod.bias.shape, generator=g) * 0.02)
            elif isinstance(mod, nn.BatchNorm2d):
                mod.weight.copy_(1 + 0.1 * torch.randn(mod.weight.shape, generator=g))
                mod.bias.copy_(0.1 * torch.randn(mod.bias.shape, generator=g))
                mod.running_mean.copy_(0.1 * torch.randn(mod.running_mean.shape, generator=g))
                mod.running_var.copy_(torch.rand(mod.running_var.shape, generator=g) + 0.5)
    twin.eval()
    return twin


def _torch_v2_twin(torch, nn, g, num_classes=7):
    """FULL torchvision.models.mobilenet_v2 architecture, hand-built
    (torchvision is not installed in this image; mirrors mobilenetv2.py
    exactly, including parameter names)."""

    class CNA(nn.Sequential):
        def __init__(self, c_in, c_out, k=1, stride=1, groups=1):
            super().__init__(
                nn.Conv2d(c_in, c_out, k, stride=stride, padding=(k - 1) // 2,
                          groups=groups, bias=False),
                nn.BatchNorm2d(c_out),
                nn.ReLU6(inplace=True),
            )

    class InvertedResidual(nn.Module):
        def __init__(self, inp, oup, stride, expand):
            super().__init__()
            hidden = int(round(inp * expand))
            layers = []
            if expand != 1:
                layers.append(CNA(inp, hidden, 1))
            layers += [
                CNA(hidden, hidden, 3, stride=stride, groups=hidden),
                nn.Conv2d(hidden, oup, 1, bias=False),
                nn.BatchNorm2d(oup),
            ]
            self.conv = nn.Sequential(*layers)
            self.use_res = stride == 1 and inp == oup

        def forward(self, x):
            return x + self.conv(x) if self.use_res else self.conv(x)

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                   (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
            features = [CNA(3, 32, 3, stride=2)]
            c_in = 32
            for t, c, n, s in cfg:
                for j in range(n):
                    features.append(InvertedResidual(c_in, c, s if j == 0 else 1, t))
                    c_in = c
            features.append(CNA(320, 1280, 1))
            self.features = nn.Sequential(*features)
            self.classifier = nn.Sequential(nn.Dropout(0.2), nn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.features(x)
            x = torch.flatten(nn.functional.adaptive_avg_pool2d(x, 1), 1)
            return self.classifier(x)

    return _init_torch(Twin(), torch, nn, g)


def _torch_v3_twin(torch, nn, g, rows, head, hidden, num_classes=7):
    """FULL torchvision.models.mobilenet_v3_* architecture, hand-built
    (mirrors mobilenetv3.py exactly, including parameter names and the
    eps=1e-3 BatchNorm)."""

    def bn(c):
        return nn.BatchNorm2d(c, eps=0.001, momentum=0.01)

    class CNA(nn.Sequential):
        def __init__(self, c_in, c_out, k=1, stride=1, groups=1, act=None):
            layers = [
                nn.Conv2d(c_in, c_out, k, stride=stride, padding=(k - 1) // 2,
                          groups=groups, bias=False),
                bn(c_out),
            ]
            if act is not None:
                layers.append(act())
            super().__init__(*layers)

    class SE(nn.Module):
        def __init__(self, c, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(c, squeeze, 1)
            self.activation = nn.ReLU()
            self.fc2 = nn.Conv2d(squeeze, c, 1)
            self.scale_activation = nn.Hardsigmoid()

        def forward(self, x):
            s = self.fc2(self.activation(self.fc1(self.avgpool(x))))
            return x * self.scale_activation(s)

    def make_div(v, d=8):
        new_v = max(d, int(v + d / 2) // d * d)
        return new_v + d if new_v < 0.9 * v else new_v

    class Bneck(nn.Module):
        def __init__(self, c_in, k, c_mid, c_out, use_se, act_name, stride):
            super().__init__()
            act = nn.Hardswish if act_name == "HS" else nn.ReLU
            layers = []
            if c_mid != c_in:
                layers.append(CNA(c_in, c_mid, 1, act=act))
            layers.append(CNA(c_mid, c_mid, k, stride=stride, groups=c_mid, act=act))
            if use_se:
                layers.append(SE(c_mid, make_div(c_mid // 4)))
            layers.append(CNA(c_mid, c_out, 1, act=None))
            self.block = nn.Sequential(*layers)
            self.use_res = stride == 1 and c_in == c_out

        def forward(self, x):
            return x + self.block(x) if self.use_res else self.block(x)

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            features = [CNA(3, 16, 3, stride=2, act=nn.Hardswish)]
            features += [Bneck(*row) for row in rows]
            features.append(CNA(rows[-1][3], head, 1, act=nn.Hardswish))
            self.features = nn.Sequential(*features)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                nn.Linear(head, hidden), nn.Hardswish(), nn.Dropout(0.2),
                nn.Linear(hidden, num_classes),
            )

        def forward(self, x):
            x = torch.flatten(self.avgpool(self.features(x)), 1)
            return self.classifier(x)

    return _init_torch(Twin(), torch, nn, g)


def _assert_parity(model, twin, torch, size=64):
    g = torch.Generator().manual_seed(7)
    x = torch.randn(2, 3, size, size, generator=g)
    with torch.no_grad():
        want = twin(x).numpy()
    params = model.load_torch_state_dict(twin.state_dict())
    got, _ = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())


def test_torch_checkpoint_conversion_parity_v2():
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    twin = _torch_v2_twin(torch, torch.nn, g)
    model = MobileNetV2(num_classes=7, dtype=jnp.float32)
    _assert_parity(model, twin, torch)


def test_torch_checkpoint_conversion_parity_v3_small():
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.models.mobilenet import _V3_SMALL

    g = torch.Generator().manual_seed(1)
    twin = _torch_v3_twin(torch, torch.nn, g, list(_V3_SMALL), head=576, hidden=1024)
    model = MobileNetV3("small", num_classes=7, dtype=jnp.float32)
    _assert_parity(model, twin, torch)


def test_torch_checkpoint_conversion_parity_v3_large():
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.models.mobilenet import _V3_LARGE

    g = torch.Generator().manual_seed(2)
    twin = _torch_v3_twin(torch, torch.nn, g, list(_V3_LARGE), head=960, hidden=1280)
    model = MobileNetV3("large", num_classes=7, dtype=jnp.float32)
    _assert_parity(model, twin, torch)


# ---------------------------------------------------------------------- LRP
def test_lrp_conservation_through_bneck():
    """ε composite conserves relevance through a full V3 bneck (expand →
    dw → SE hard-sigmoid gate → project → residual): hardswish pass-through,
    CP-LRP constant gate, proportional residual split. Also guards relu6:
    its raw gradient would erase relevance at saturated (>6) units."""
    from semanticlens_tpu.models.base import TapCollector
    from semanticlens_tpu.models.layers import lrp_composite, relu6

    model = MobileNetV3("small", num_classes=0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    params = {
        k: (jnp.zeros_like(v) if k.endswith((".bias", ".running_mean")) else v)
        for k, v in params.items()
    }
    bi = 5  # (40, 5, 240, 40, True, "HS", 1): expand + SE + residual
    blk = model.blocks[bi - 1]
    assert blk.residual and blk.has_expand and blk.use_se

    def block(x):
        return model._bneck(params, x, f"features.{bi}", blk, TapCollector(()))

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, blk.c_in)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(block, x)
        (r_in,) = vjp_fn(out)
    np.testing.assert_allclose(
        float(np.asarray(r_in, np.float64).sum()),
        float(np.asarray(out, np.float64).sum()),
        rtol=1e-3,
    )

    # relu6 in isolation: pass-through conserves even with saturated units,
    # where the raw gradient mask drops their relevance.
    v = jnp.asarray(np.array([[-1.0, 2.0, 9.0, 7.5]], np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        y, vjp_fn = jax.vjp(relu6, v)
        (r,) = vjp_fn(y)
    assert float(r.sum()) == float(y.sum())  # pass-through: R_in = R_out
    y_g, vjp_g = jax.vjp(jax.nn.relu6, v)
    (g,) = vjp_g(y_g)
    assert float(g.sum()) < float(y_g.sum())  # raw grad loses the 6.0s


def test_collect_e2e(tmp_path):
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = MobileNetV3("small", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "mbv3-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(10, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.4"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=5)
    assert cache["features.4"].activations.shape == (40, 3)
