"""Structural, tap, and torch-twin parity tests for MaxViT."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.maxvit import MaxViT


@pytest.fixture(scope="module")
def mvt():
    model = MaxViT("tiny", num_classes=10, partition_size=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_torchvision_compatible(mvt):
    model, _ = mvt
    for name in ["stem.0.0", "stem.1.0",
                 "blocks.0.layers.0.layers.MBconv.layers.conv_a.0",
                 "blocks.0.layers.0.layers.MBconv.proj.1",
                 "blocks.1.layers.1.layers.MBconv.layers.squeeze_excitation.fc1",
                 "blocks.2.layers.4.layers.window_attention.attn_layer.1",
                 "blocks.3.layers.0.layers.grid_attention.mlp_layer.3",
                 "classifier.2", "classifier.5"]:
        assert name in model.module_names, name
    # non-downsampling, same-width layers have no projection shortcut
    assert "blocks.0.layers.1.layers.MBconv.proj" not in model.module_names
    validate_layers(model, ["blocks.2.layers.3"])
    with pytest.raises(ValueError):
        MaxViT("large")
    headless = MaxViT("tiny", num_classes=0, partition_size=2)
    assert "classifier.3" not in headless.module_names
    assert "classifier.2" in headless.module_names  # pre-head LN always runs


def test_forward_shapes_and_partition_guard(mvt):
    model, params = mvt
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    logits, taps = model.apply(params, jnp.asarray(x), ("blocks.0", "blocks.3", "classifier.0"))
    assert logits.shape == (2, 10)
    assert taps["blocks.0"].shape == (2, 16, 16, 64)
    assert taps["blocks.3"].shape == (2, 2, 2, 512)
    assert taps["classifier.0"].shape == (2, 1, 1, 512)
    with pytest.raises(ValueError, match="not divisible"):
        model.apply(params, jnp.zeros((1, 40, 40, 3), jnp.float32))


def _build_torch_twin(torch, num_classes=5, p=2):
    """MaxViT twin with torchvision's module tree: MBConv (pre-norm, SE,
    AvgPool+1×1 shortcut), pre-LN relative-position window/grid attention
    with the SwapAxes grid trick, LN→Linear→Tanh→Linear classifier."""
    nn = torch.nn
    F = torch.nn.functional
    g = torch.Generator().manual_seed(0)

    def fill(net):
        for m in net.modules():
            if isinstance(m, nn.Conv2d):
                with torch.no_grad():
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.04)
                    if m.bias is not None:
                        m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.04)
            elif isinstance(m, nn.BatchNorm2d):
                with torch.no_grad():
                    m.weight.copy_(1.0 + 0.1 * torch.randn(m.weight.shape, generator=g))
                    m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
                    m.running_mean.copy_(0.1 * torch.randn(m.running_mean.shape, generator=g))
                    m.running_var.copy_((1.0 + 0.1 * torch.randn(m.running_var.shape, generator=g)).abs())
            elif isinstance(m, nn.LayerNorm):
                with torch.no_grad():
                    m.weight.copy_(1.0 + 0.1 * torch.randn(m.weight.shape, generator=g))
                    m.bias.copy_(0.05 * torch.randn(m.bias.shape, generator=g))
            elif isinstance(m, nn.Linear):
                with torch.no_grad():
                    m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.02)
                    if m.bias is not None:
                        m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.02)
        return net

    def rel_index():
        coords = torch.stack(torch.meshgrid(torch.arange(p), torch.arange(p), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += p - 1
        rel[:, :, 1] += p - 1
        rel[:, :, 0] *= 2 * p - 1
        return rel.sum(-1).flatten()

    REL = rel_index()

    class RelMHA(nn.Module):
        def __init__(self, dim, head_dim):
            super().__init__()
            self.heads = dim // head_dim
            self.head_dim = head_dim
            self.to_qkv = nn.Linear(dim, 3 * dim)
            self.merge = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                0.02 * torch.randn((2 * p - 1) ** 2, self.heads, generator=g)
            )

        def forward(self, x):  # (N, T, C)
            n, t, c = x.shape
            qkv = self.to_qkv(x).reshape(n, t, 3, self.heads, self.head_dim)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            # torchvision scales by feat_dim**-0.5 (full width), NOT head_dim
            attn = (q @ k.transpose(-2, -1)) * c ** -0.5
            bias = self.relative_position_bias_table[REL].view(t, t, -1).permute(2, 0, 1)
            attn = F.softmax(attn + bias.unsqueeze(0), dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(n, t, c)
            return self.merge(out)

    class PartAttn(nn.Module):
        def __init__(self, dim, head_dim, grid):
            super().__init__()
            self.grid = grid
            self.attn_layer = nn.Sequential(nn.LayerNorm(dim), RelMHA(dim, head_dim))
            self.mlp_layer = nn.Sequential(
                nn.LayerNorm(dim), nn.Linear(dim, 4 * dim), nn.GELU(), nn.Linear(4 * dim, dim)
            )

        def forward(self, x):  # (B, H, W, C) channels-last
            B, H, W, C = x.shape
            q = H // p if self.grid else p
            nh, nw = H // q, W // q
            xw = x.view(B, nh, q, nw, q, C).permute(0, 1, 3, 2, 4, 5).reshape(B * nh * nw, q * q, C)
            if self.grid:
                xw = xw.view(B, nh * nw, q * q, C).transpose(1, 2).reshape(B * q * q, nh * nw, C)
            xw = xw + self.attn_layer(xw)
            xw = xw + self.mlp_layer(xw)
            if self.grid:
                xw = xw.view(B, q * q, nh * nw, C).transpose(1, 2).reshape(B * nh * nw, q * q, C)
            x = xw.view(B, nh, nw, q, q, C).permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
            return x

    class MBConv(nn.Module):
        def __init__(self, cin, cout, stride):
            super().__init__()
            mid = cout * 4
            if stride != 1 or cin != cout:
                mods = ([nn.AvgPool2d(3, stride, padding=1)] if stride == 2 else [])
                mods.append(nn.Conv2d(cin, cout, 1))
                self.proj = nn.Sequential(*mods) if stride == 2 else nn.Sequential(
                    nn.Identity(), nn.Conv2d(cin, cout, 1))
            else:
                self.proj = None

            class SE(nn.Module):
                def __init__(self):
                    super().__init__()
                    self.avgpool = nn.AdaptiveAvgPool2d(1)
                    self.fc1 = nn.Conv2d(mid, int(mid * 0.25), 1)
                    self.activation = nn.SiLU()
                    self.fc2 = nn.Conv2d(int(mid * 0.25), mid, 1)
                    self.scale_activation = nn.Sigmoid()

                def forward(self, z):
                    s = self.scale_activation(self.fc2(self.activation(self.fc1(self.avgpool(z)))))
                    return z * s

            from collections import OrderedDict
            self.layers = nn.Sequential(OrderedDict([
                ("pre_norm", nn.BatchNorm2d(cin, eps=1e-3)),
                ("conv_a", nn.Sequential(nn.Conv2d(cin, mid, 1, bias=False),
                                         nn.BatchNorm2d(mid, eps=1e-3), nn.GELU())),
                ("conv_b", nn.Sequential(nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False),
                                         nn.BatchNorm2d(mid, eps=1e-3), nn.GELU())),
                ("squeeze_excitation", SE()),
                ("conv_c", nn.Conv2d(mid, cout, 1)),
            ]))

        def forward(self, x):
            sc = x if self.proj is None else self.proj(x)
            return sc + self.layers(x)

    class Layer(nn.Module):
        def __init__(self, cin, cout, stride, head_dim):
            super().__init__()
            from collections import OrderedDict
            self.layers = nn.Sequential(OrderedDict([
                ("MBconv", MBConv(cin, cout, stride)),
                ("window_attention", PartAttn(cout, head_dim, grid=False)),
                ("grid_attention", PartAttn(cout, head_dim, grid=True)),
            ]))

        def forward(self, x):  # NCHW in/out; attention runs channels-last
            x = self.layers.MBconv(x)
            x = x.permute(0, 2, 3, 1)
            x = self.layers.window_attention(x)
            x = self.layers.grid_attention(x)
            return x.permute(0, 3, 1, 2)

    class Block(nn.Module):
        def __init__(self, cin, cout, n, head_dim):
            super().__init__()
            self.layers = nn.Sequential(
                *[Layer(cin if i == 0 else cout, cout, 2 if i == 0 else 1, head_dim)
                  for i in range(n)]
            )

        def forward(self, x):
            return self.layers(x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            chans, layers, hd = (64, 128, 256, 512), (2, 2, 5, 2), 32
            self.stem = nn.Sequential(
                nn.Sequential(nn.Conv2d(3, 64, 3, 2, 1, bias=False),
                              nn.BatchNorm2d(64, eps=1e-3), nn.GELU()),
                nn.Sequential(nn.Conv2d(64, 64, 3, 1, 1)),
            )
            cin = 64
            self.blocks = nn.ModuleList()
            for cout, n in zip(chans, layers):
                self.blocks.append(Block(cin, cout, n, hd))
                cin = cout
            self.classifier = nn.Sequential(
                nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.LayerNorm(512),
                nn.Linear(512, 512), nn.Tanh(), nn.Linear(512, num_classes, bias=False),
            )

        def forward(self, x):
            x = self.stem(x)
            for b in self.blocks:
                x = b(x)
            return self.classifier(x)

    return fill(Net()).eval()


def test_maxvit_torch_parity():
    """Full-depth MaxViT-T twin (MBConv w/ pre-norm + SE + pooled shortcut,
    window AND grid relative-position attention with the SwapAxes grid
    trick, tanh-MLP classifier) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    sd = tmodel.state_dict()
    # the twin's stride-1 proj uses Identity at index 0 to keep conv at .1
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = MaxViT("tiny", num_classes=5, partition_size=2, dtype=jnp.float32)
    params = m.load_torch_state_dict(sd)
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("blocks.2",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["blocks.2"].shape == (2, 4, 4, 256)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = MaxViT("tiny", num_classes=4, partition_size=2, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "maxvit-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["blocks.1"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["blocks.1"].activations.shape == (128, 3)


def test_lrp_conservation_through_maxvit_layer():
    """ε composite conserves through one full MaxViT layer (MBConv with SE
    constant gate + window + grid attention, detached-LN, CP-LRP)."""
    from semanticlens_tpu.models.base import TapCollector
    from semanticlens_tpu.models.layers import lrp_composite

    model = MaxViT("tiny", num_classes=0, partition_size=2, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2))
    params = {
        k: (jnp.zeros_like(v) if k.endswith((".bias", ".running_mean")) else v)
        for k, v in params.items()
    }

    def layer(x):
        tap = TapCollector(())
        h = model._mbconv(params, x, "blocks.1.layers.1.layers.MBconv", 128, 128, 1, tap)
        h = model._partition_attention(
            params, h, "blocks.1.layers.1.layers.window_attention", 4, "window", tap)
        return model._partition_attention(
            params, h, "blocks.1.layers.1.layers.grid_attention", 4, "grid", tap)

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 8, 8, 128)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(layer, x)
        (r_in,) = vjp_fn(out)
    np.testing.assert_allclose(
        float(np.asarray(r_in, np.float64).sum()),
        float(np.asarray(out, np.float64).sum()),
        rtol=5e-2,
    )
