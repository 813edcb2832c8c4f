"""Structural, generation-math, tap, and torch-twin tests for RegNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.regnet import RegNet, generate_stage_params


@pytest.fixture(scope="module")
def y400():
    model = RegNet("y_400mf", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_generated_stage_params_match_published():
    """The five-number generator must reproduce the published RegNet stage
    tuples (paper Table / pycls model zoo; torchvision generates the same
    except where _make_divisible diverges — x_400mf's 400-wide last stage)."""
    cases = {
        "y_400mf": ([48, 104, 208, 440], [1, 3, 6, 6], 8),
        "y_800mf": ([64, 144, 320, 784], [1, 3, 8, 2], 16),
        "y_1_6gf": ([48, 120, 336, 888], [2, 6, 17, 2], 24),
        "y_3_2gf": ([72, 216, 576, 1512], [2, 5, 13, 1], 24),
        "x_400mf": ([32, 64, 160, 400], [1, 2, 7, 12], 16),  # torchvision's 400
        "x_800mf": ([64, 128, 288, 672], [1, 3, 7, 5], 16),
        "x_1_6gf": ([72, 168, 408, 912], [2, 4, 10, 2], 24),
    }
    from semanticlens_tpu.models.regnet import _VARIANTS

    for variant, (widths, depths, g) in cases.items():
        depth, w_0, w_a, w_m, gw, _ = _VARIANTS[variant]
        ws, ds, gs = generate_stage_params(depth, w_0, w_a, w_m, gw)
        assert ws == widths, variant
        assert ds == depths, variant
        assert all(x == g for x in gs), variant
        assert sum(ds) == depth, variant


def test_module_names_torchvision_compatible(y400):
    model, _ = y400
    for name in ["stem.0", "stem.1", "trunk_output.block1",
                 "trunk_output.block1.block1-0.proj.0",
                 "trunk_output.block2.block2-1.f.b.0",
                 "trunk_output.block2.block2-1.f.se.fc1",
                 "trunk_output.block4.block4-5.activation",
                 "avgpool", "fc"]:
        assert name in model.module_names, name
    # non-first blocks have no proj; X variants have no se
    assert "trunk_output.block2.block2-1.proj" not in model.module_names
    x = RegNet("x_800mf", num_classes=0)
    assert not any(".se" in n for n in x.module_names)
    assert "fc" not in x.module_names
    with pytest.raises(ValueError):
        RegNet("z_1gf")


def test_forward_shapes_and_validate(y400):
    model, params = y400
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(
        params, jnp.asarray(x),
        tap_names=("trunk_output.block1", "trunk_output.block4", "avgpool"),
    )
    assert logits.shape == (2, 10)
    assert taps["trunk_output.block1"].shape == (2, 16, 16, 48)
    assert taps["trunk_output.block4"].shape == (2, 2, 2, 440)
    assert taps["avgpool"].shape == (2, 1, 1, 440)
    validate_layers(model, ["trunk_output.block3.block3-2.f.c.1"])
    with pytest.raises(ValueError):
        validate_layers(model, ["trunk_output.block5"])


def test_headless():
    model = RegNet("y_400mf", num_classes=0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1))
    feats, _ = model.apply(params, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 440)
    assert model.num_features == 440


def _build_torch_twin(torch, num_classes=5):
    """RegNetY-400MF twin with torchvision's exact module tree/names."""
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def fill(module):
        for m in module.modules():
            if isinstance(m, nn.Conv2d):
                with torch.no_grad():
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
                    if m.bias is not None:
                        m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)
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
        return module

    def cna(cin, cout, k, stride=1, groups=1, act=True):
        layers = [nn.Conv2d(cin, cout, k, stride=stride, padding=(k - 1) // 2,
                            groups=groups, bias=False), nn.BatchNorm2d(cout)]
        if act:
            layers.append(nn.ReLU())
        return nn.Sequential(*layers)

    class SE(nn.Module):
        def __init__(self, ch, squeeze):
            super().__init__()
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc1 = nn.Conv2d(ch, squeeze, 1)
            self.activation = nn.ReLU()
            self.fc2 = nn.Conv2d(squeeze, ch, 1)
            self.scale_activation = nn.Sigmoid()

        def forward(self, x):
            s = self.scale_activation(self.fc2(self.activation(self.fc1(self.avgpool(x)))))
            return x * s

    class Bottleneck(nn.Module):
        def __init__(self, cin, cout, stride, group_width, se_in):
            super().__init__()
            self.a = cna(cin, cout, 1)
            self.b = cna(cout, cout, 3, stride=stride, groups=cout // group_width)
            self.se = SE(cout, int(round(0.25 * se_in)))
            self.c = cna(cout, cout, 1, act=False)

        def forward(self, x):
            return self.c(self.se(self.b(self.a(x))))

    class Block(nn.Module):
        def __init__(self, cin, cout, stride, group_width):
            super().__init__()
            if cin != cout or stride != 1:
                self.proj = cna(cin, cout, 1, stride=stride, act=False)
            else:
                self.proj = None
            self.f = Bottleneck(cin, cout, stride, group_width, se_in=cin)
            self.activation = nn.ReLU()

        def forward(self, x):
            sc = x if self.proj is None else self.proj(x)
            return self.activation(sc + self.f(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            widths, depths, gw = [48, 104, 208, 440], [1, 3, 6, 6], 8
            self.stem = cna(3, 32, 3, stride=2)
            trunk = nn.Sequential()
            cin = 32
            for s, (w, d) in enumerate(zip(widths, depths), start=1):
                stage = nn.Sequential()
                for i in range(d):
                    stage.add_module(
                        f"block{s}-{i}",
                        Block(cin if i == 0 else w, w, 2 if i == 0 else 1, gw),
                    )
                trunk.add_module(f"block{s}", stage)
                cin = w
            self.trunk_output = trunk
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(440, num_classes)

        def forward(self, x):
            x = self.avgpool(self.trunk_output(self.stem(x)))
            return self.fc(torch.flatten(x, 1))

    return fill(Net()).eval()


def test_regnet_torch_parity():
    """Full-depth RegNetY-400MF twin (grouped 3×3, per-block-input SE widths,
    stage-start proj shortcuts) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = RegNet("y_400mf", num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                        ("trunk_output.block3",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["trunk_output.block3"].shape == (2, 4, 4, 208)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = RegNet("y_400mf", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "regnet-y400-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["trunk_output.block2"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["trunk_output.block2"].activations.shape == (104, 3)
