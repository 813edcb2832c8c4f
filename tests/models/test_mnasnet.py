"""Structural, tap, and torch-twin parity tests for MNASNet."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.mnasnet import MNASNet


@pytest.fixture(scope="module")
def m1_0():
    model = MNASNet("1_0", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_depths_and_module_names(m1_0):
    model, _ = m1_0
    assert model.depths == (32, 16, 24, 40, 80, 96, 192, 320)
    assert MNASNet("0_5").depths == (16, 8, 16, 24, 40, 48, 96, 160)
    assert MNASNet("1_3").depths == (40, 24, 32, 56, 104, 128, 248, 416)
    for name in ["layers.0", "layers.7", "layers.8.0.layers.3",
                 "layers.12.3.layers.7", "layers.14", "layers.16",
                 "classifier.1"]:
        assert name in model.module_names, name
    assert "layers.13.1" not in model.module_names  # last stack has 1 block
    assert "avgpool" not in model.module_names  # functional mean pooling
    validate_layers(model, ["layers.10.2"])
    with pytest.raises(ValueError):
        MNASNet("2_0")


def test_forward_shapes_and_tap_contract(m1_0):
    model, params = m1_0
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(
        params, jnp.asarray(x), tap_names=tuple(model.module_names)
    )
    assert logits.shape == (2, 10)
    assert taps["layers.8"].shape == (2, 16, 16, 24)
    assert taps["layers.13"].shape == (2, 2, 2, 320)
    assert taps["layers"].shape == (2, 2, 2, 1280)
    missing = [n for n in model.module_names if n not in taps]
    assert not missing, missing
    bad = {n: tuple(v.shape) for n, v in taps.items() if v.shape[0] != 2}
    assert not bad, bad
    headless = MNASNet("0_5", num_classes=0, dtype=jnp.float32)
    feats, _ = headless.apply(headless.init(jax.random.PRNGKey(1)),
                              jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert feats.shape == (1, 1280)


def _build_torch_twin(torch, num_classes=5):
    """MNASNet-1.0 twin with torchvision's exact flat layers tree."""
    nn = torch.nn
    g = torch.Generator().manual_seed(0)

    class IR(nn.Module):
        def __init__(self, cin, cout, k, stride, expansion):
            super().__init__()
            mid = cin * expansion
            self.layers = nn.Sequential(
                nn.Conv2d(cin, mid, 1, bias=False), nn.BatchNorm2d(mid), nn.ReLU(),
                nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid, bias=False),
                nn.BatchNorm2d(mid), nn.ReLU(),
                nn.Conv2d(mid, cout, 1, bias=False), nn.BatchNorm2d(cout),
            )
            self.residual = cin == cout and stride == 1

        def forward(self, x):
            h = self.layers(x)
            return x + h if self.residual else h

    def stack(cin, cout, k, stride, expansion, repeats):
        blocks = [IR(cin, cout, k, stride, expansion)]
        blocks += [IR(cout, cout, k, 1, expansion) for _ in range(repeats - 1)]
        return nn.Sequential(*blocks)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            d = (32, 16, 24, 40, 80, 96, 192, 320)
            self.layers = nn.Sequential(
                nn.Conv2d(3, d[0], 3, 2, 1, bias=False), nn.BatchNorm2d(d[0]), nn.ReLU(),
                nn.Conv2d(d[0], d[0], 3, 1, 1, groups=d[0], bias=False),
                nn.BatchNorm2d(d[0]), nn.ReLU(),
                nn.Conv2d(d[0], d[1], 1, bias=False), nn.BatchNorm2d(d[1]),
                stack(d[1], d[2], 3, 2, 3, 3),
                stack(d[2], d[3], 5, 2, 3, 3),
                stack(d[3], d[4], 5, 2, 6, 3),
                stack(d[4], d[5], 3, 1, 6, 2),
                stack(d[5], d[6], 5, 2, 6, 4),
                stack(d[6], d[7], 3, 1, 6, 1),
                nn.Conv2d(d[7], 1280, 1, bias=False), nn.BatchNorm2d(1280), nn.ReLU(),
            )
            self.classifier = nn.Sequential(nn.Dropout(0.0), nn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.layers(x).mean([2, 3])
            return self.classifier(x)

    net = Net()
    for m in net.modules():
        if isinstance(m, nn.Conv2d):
            with torch.no_grad():
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.04)
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


def test_mnasnet_torch_parity():
    """Full-depth MNASNet-1.0 twin (flat stem, 5×5 depthwise stacks,
    integer-factor expansion) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()
    m = MNASNet("1_0", num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("layers.10",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["layers.10"].shape == (2, 4, 4, 80)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = MNASNet("0_5", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "mnasnet-05-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["layers.10"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["layers.10"].activations.shape == (40, 3)
