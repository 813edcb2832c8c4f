"""EfficientNet subject family: torchvision-name parity, compound scaling,
checkpoint conversion, engine integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import EfficientNet
from semanticlens_tpu.models.efficientnet import _make_divisible


def test_compound_scaling_head_widths():
    # torchvision classifier in_features: b0→1280 … b7→2560
    for variant, want in [("b0", 1280), ("b1", 1280), ("b2", 1408), ("b3", 1536),
                          ("b4", 1792), ("b5", 2048), ("b6", 2304), ("b7", 2560)]:
        assert EfficientNet(variant=variant).num_features == want, variant


def test_block_counts():
    # torchvision depths: b0 has 16 MBConvs, b1 23
    for variant, want in [("b0", 16), ("b1", 23)]:
        model = EfficientNet(variant=variant)
        assert sum(len(s) for s in model.stages) == want, variant


def test_make_divisible_matches_torchvision():
    # spot values from torchvision._utils._make_divisible
    assert _make_divisible(32 * 1.1) == 32
    assert _make_divisible(320 * 1.1) == 352
    assert _make_divisible(320 * 1.4) == 448
    assert _make_divisible(16 * 1.2) == 24  # 19.2 → 16 < 0.9·19.2 → bumped


def test_module_names_torchvision_compatible():
    model = EfficientNet(variant="b0", num_classes=10)
    for name in [
        "features.0.0",
        "features.1.0.block.0.0",      # first stage: expand_ratio 1 → dw first
        "features.2.0.block.0.0",      # expansion conv
        "features.2.0.block.1.0",      # depthwise
        "features.2.0.block.2.fc1",    # SE
        "features.2.0.block.3.1",      # project BN
        "features.6.3",                # stage 6 has 4 blocks in b0
        "features.8.0",
        "classifier.1",
    ]:
        assert name in model.module_names, name
    assert "features.1.0.block.3" not in model.module_names  # no expand → 3 entries
    assert "features.6.4" not in model.module_names


def test_forward_shapes_and_taps():
    model = EfficientNet(variant="b0", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 224, 224, 3)).astype(np.float32))
    logits, taps = model.apply(
        params, x,
        ("features.0", "features.2", "features.4", "features.8", "avgpool"),
    )
    assert logits.shape == (2, 10)
    assert taps["features.0"].shape == (2, 112, 112, 32)
    assert taps["features.2"].shape == (2, 56, 56, 24)
    assert taps["features.4"].shape == (2, 14, 14, 80)
    assert taps["features.8"].shape == (2, 7, 7, 1280)
    assert taps["avgpool"].shape == (2, 1, 1, 1280)


def test_headless():
    m = EfficientNet(variant="b0", num_classes=0, dtype=jnp.float32)
    assert "classifier" not in m.module_names
    assert "classifier.1" not in m.module_names
    p = m.init(jax.random.PRNGKey(1))
    out, _ = m.apply(p, jnp.zeros((1, 224, 224, 3), jnp.float32))
    assert out.shape == (1, 1280)


def test_unknown_variant():
    with pytest.raises(ValueError):
        EfficientNet(variant="b9")


def _torch_effnet_twin(torch, nn, g, num_classes=7):
    """Hand-built torchvision-architecture EfficientNet slice (torchvision is
    not installed in this image; mirrors torchvision.models.efficientnet.MBConv
    exactly, including parameter names). Two stages: a no-expand MBConv stage
    and an expand-6 stage with stride 2 + a residual block."""

    class ConvBNAct(nn.Sequential):
        def __init__(self, c_in, c_out, k=1, stride=1, groups=1, act=True):
            layers = [
                nn.Conv2d(c_in, c_out, k, stride=stride, padding=(k - 1) // 2,
                          groups=groups, bias=False),
                nn.BatchNorm2d(c_out),
            ]
            if act:
                layers.append(nn.SiLU())
            super().__init__(*layers)

    class SE(nn.Module):
        def __init__(self, c, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(c, squeeze, 1)
            self.activation = nn.SiLU()
            self.fc2 = nn.Conv2d(squeeze, c, 1)
            self.scale_activation = nn.Sigmoid()

        def forward(self, x):
            s = self.fc2(self.activation(self.fc1(self.avgpool(x))))
            return x * self.scale_activation(s)

    class MBConv(nn.Module):
        def __init__(self, c_in, c_out, expand, k, stride):
            super().__init__()
            c_mid = c_in * expand
            layers = []
            if expand != 1:
                layers.append(ConvBNAct(c_in, c_mid, 1))
            layers.append(ConvBNAct(c_mid, c_mid, k, stride=stride, groups=c_mid))
            layers.append(SE(c_mid, max(1, c_in // 4)))
            layers.append(ConvBNAct(c_mid, c_out, 1, act=False))
            self.block = nn.Sequential(*layers)
            self.stochastic_depth = nn.Identity()
            self.use_res = stride == 1 and c_in == c_out

        def forward(self, x):
            h = self.stochastic_depth(self.block(x))
            return h + x if self.use_res else h

    class Twin(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(
                ConvBNAct(3, 8, 3, stride=2),
                nn.Sequential(MBConv(8, 8, 1, 3, 1)),
                nn.Sequential(MBConv(8, 16, 6, 3, 2), MBConv(16, 16, 6, 3, 1)),
                ConvBNAct(16, 64, 1),
            )
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(nn.Dropout(0.0), nn.Linear(64, num_classes))

        def forward(self, x):
            x = self.features(x)
            x = torch.flatten(self.avgpool(x), 1)
            return self.classifier(x)

    twin = Twin()
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


def _shrunk_model(num_classes=7):
    """EfficientNet instance reconfigured to the twin's two-stage layout."""
    from semanticlens_tpu.models.efficientnet import _BlockCfg

    model = EfficientNet(variant="b0", num_classes=num_classes, dtype=jnp.float32)
    model.stem_ch = 8
    model.stages = [
        [_BlockCfg(1, 3, 1, 8, 8)],
        [_BlockCfg(6, 3, 2, 8, 16), _BlockCfg(6, 3, 1, 16, 16)],
    ]
    model.head_ch = model.num_features = 64
    model.module_names = tuple(model._enumerate_module_names())
    return model


def test_torch_checkpoint_conversion_parity():
    torch = pytest.importorskip("torch")
    g = torch.Generator().manual_seed(0)
    twin = _torch_effnet_twin(torch, torch.nn, g)

    x = torch.randn(2, 3, 64, 64, generator=g)
    with torch.no_grad():
        want = twin(x).numpy()

    model = _shrunk_model()
    params = model.load_torch_state_dict(twin.state_dict())
    got, _ = model.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got)
    cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, cos
    np.testing.assert_allclose(got, want, atol=5e-3 * np.abs(want).max())


def test_lrp_conservation_through_mbconv():
    """ε composite conserves relevance through a full MBConv (expand → dw →
    SE gate → project → residual): silu pass-through, CP-LRP constant gate,
    proportional residual split. Biases/means zeroed (they absorb relevance,
    as in the ViT-block conservation test)."""
    from semanticlens_tpu.models.layers import lrp_composite

    model = _shrunk_model(num_classes=0)
    params = model.init(jax.random.PRNGKey(0))
    params = {
        k: (jnp.zeros_like(v) if k.endswith((".bias", ".running_mean")) else v)
        for k, v in params.items()
    }

    cfg = model.stages[1][1]  # expand-6, stride-1, residual block
    assert cfg.residual and cfg.has_expand

    def block(x):
        tap = __import__("semanticlens_tpu.models.base", fromlist=["TapCollector"]).TapCollector(())
        return model._mbconv(params, x, "features.2.1", cfg, tap)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 8, 16)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(block, x)
        (r_in,) = vjp_fn(out)
    r_in_sum = float(np.asarray(r_in, np.float64).sum())
    r_out_sum = float(np.asarray(out, np.float64).sum())
    np.testing.assert_allclose(r_in_sum, r_out_sum, rtol=1e-3)

    # The SE gate in isolation: ε composite conserves; the raw gradient
    # rescales relevance by the sigmoid gate (≤ 0.5 at zero-bias init) and
    # leaks through the squeeze branch — materially non-conserving.
    from semanticlens_tpu.models.base import TapCollector

    def se_only(h):
        return model._squeeze_excite(params, h, "features.2.1.block.2", TapCollector(()))

    h = jnp.asarray(np.random.default_rng(4).normal(size=(2, 8, 8, cfg.c_mid)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out_se, vjp_fn = jax.vjp(se_only, h)
        (r_se,) = vjp_fn(out_se)
    np.testing.assert_allclose(
        float(np.asarray(r_se, np.float64).sum()),
        float(np.asarray(out_se, np.float64).sum()),
        rtol=1e-3,
    )
    with lrp_composite("gradient"):
        out_g, vjp_fn = jax.vjp(se_only, h)
        (g_se,) = vjp_fn(out_g)
    g_ratio = float(np.asarray(g_se, np.float64).sum()) / float(np.asarray(out_g, np.float64).sum())
    assert abs(g_ratio - 1.0) > 0.2, g_ratio


def test_collect_e2e(tmp_path):
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = _shrunk_model(num_classes=4)
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "effnet-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(10, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.2"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=5)
    assert cache["features.2"].activations.shape == (16, 3)
