"""Structural, shuffle-math, tap, and torch-twin tests for ShuffleNetV2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.shufflenet import ShuffleNetV2, channel_shuffle


@pytest.fixture(scope="module")
def x1_0():
    model = ShuffleNetV2("x1_0", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_channel_shuffle_matches_torch_semantics():
    """NHWC shuffle == torch's NCHW view/transpose/flatten on the channel
    axis (channel g·(C/2)+a → a·2+g)."""
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, 4, 4, 8)).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    b, c, h, w = t.shape
    want = (
        t.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)
        .numpy().transpose(0, 2, 3, 1)
    )
    got = np.asarray(channel_shuffle(jnp.asarray(x), 2))
    np.testing.assert_array_equal(got, want)


def test_module_names_torchvision_compatible(x1_0):
    model, _ = x1_0
    for name in ["conv1.0", "conv1.1", "maxpool",
                 "stage2.0.branch1.0", "stage2.0.branch2.3",
                 "stage3.7.branch2", "stage4.3", "conv5.0", "fc"]:
        assert name in model.module_names, name
    # stride-1 units own an empty, never-called branch1 in torchvision —
    # hooks on it never fire, so it must not be advertised as tappable.
    assert "stage2.1.branch1" not in model.module_names
    assert "stage2.1.branch2.7" in model.module_names
    assert "avgpool" not in model.module_names  # functional mean pooling
    with pytest.raises(ValueError):
        ShuffleNetV2("x3_0")


def test_forward_shapes_and_variants(x1_0):
    model, params = x1_0
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(
        params, jnp.asarray(x), tap_names=("stage2", "stage4", "conv5")
    )
    assert logits.shape == (2, 10)
    assert taps["stage2"].shape == (2, 8, 8, 116)
    assert taps["stage4"].shape == (2, 2, 2, 464)
    assert taps["conv5"].shape == (2, 2, 2, 1024)
    validate_layers(model, ["stage3.4.branch2.5"])
    assert ShuffleNetV2("x0_5").num_features == 1024
    assert ShuffleNetV2("x2_0").num_features == 2048
    headless = ShuffleNetV2("x0_5", num_classes=0, dtype=jnp.float32)
    feats, _ = headless.apply(headless.init(jax.random.PRNGKey(1)),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 1024)
    assert "fc" not in headless.module_names


def _build_torch_twin(torch, num_classes=5):
    """ShuffleNetV2-x1.0 twin with torchvision's exact module tree/names."""
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    def fill(module):
        for m in module.modules():
            if isinstance(m, nn.Conv2d):
                with torch.no_grad():
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.05)
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

    def shuffle(x):
        b, c, h, w = x.shape
        return x.view(b, 2, c // 2, h, w).transpose(1, 2).reshape(b, c, h, w)

    class Unit(nn.Module):
        def __init__(self, inp, oup, stride):
            super().__init__()
            self.stride = stride
            bf = oup // 2
            if stride > 1:
                self.branch1 = nn.Sequential(
                    nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                    nn.BatchNorm2d(inp),
                    nn.Conv2d(inp, bf, 1, bias=False),
                    nn.BatchNorm2d(bf),
                    nn.ReLU(),
                )
            else:
                self.branch1 = nn.Sequential()
            self.branch2 = nn.Sequential(
                nn.Conv2d(inp if stride > 1 else bf, bf, 1, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(),
                nn.Conv2d(bf, bf, 3, stride, 1, groups=bf, bias=False),
                nn.BatchNorm2d(bf),
                nn.Conv2d(bf, bf, 1, bias=False),
                nn.BatchNorm2d(bf),
                nn.ReLU(),
            )

        def forward(self, x):
            if self.stride == 1:
                x1, x2 = x.chunk(2, dim=1)
                out = torch.cat((x1, self.branch2(x2)), dim=1)
            else:
                out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
            return shuffle(out)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            chans = (24, 116, 232, 464, 1024)
            self.conv1 = nn.Sequential(
                nn.Conv2d(3, 24, 3, 2, 1, bias=False), nn.BatchNorm2d(24), nn.ReLU()
            )
            self.maxpool = nn.MaxPool2d(3, 2, padding=1)
            cin = 24
            for si, reps in zip((2, 3, 4), (4, 8, 4)):
                cout = chans[si - 1]
                units = [Unit(cin, cout, 2)] + [Unit(cout, cout, 1) for _ in range(reps - 1)]
                setattr(self, f"stage{si}", nn.Sequential(*units))
                cin = cout
            self.conv5 = nn.Sequential(
                nn.Conv2d(cin, 1024, 1, bias=False), nn.BatchNorm2d(1024), nn.ReLU()
            )
            self.fc = nn.Linear(1024, num_classes)

        def forward(self, x):
            x = self.maxpool(self.conv1(x))
            x = self.stage4(self.stage3(self.stage2(x)))
            x = self.conv5(x)
            return self.fc(x.mean([2, 3]))

    return fill(Net()).eval()


def test_shufflenet_torch_parity():
    """Full-depth ShuffleNetV2-x1.0 twin (channel split/shuffle, dual-branch
    downsampling, functional mean pool) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = ShuffleNetV2("x1_0", num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("stage3",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["stage3"].shape == (2, 4, 4, 232)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = ShuffleNetV2("x0_5", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "shufflenet-x05-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["stage3"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["stage3"].activations.shape == (96, 3)
