"""Structural, tap, and torch-twin parity tests for Swin Transformer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.base import validate_layers
from semanticlens_tpu.models.swin import SwinTransformer


@pytest.fixture(scope="module")
def swin_t():
    model = SwinTransformer("tiny", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_module_names_torchvision_compatible(swin_t):
    model, _ = swin_t
    for name in ["features.0.0", "features.0.2", "features.1.0.norm1",
                 "features.1.1.attn", "features.2.reduction", "features.2.norm",
                 "features.5.5.mlp.3", "features.7.1.stochastic_depth",
                 "norm", "avgpool", "flatten", "head"]:
        assert name in model.module_names, name
    # torchvision computes qkv/proj with F.linear inside the functional
    # shifted_window_attention — hooks on them never fire there, so they
    # must not be advertised as tappable here either.
    assert "features.1.1.attn.qkv" not in model.module_names
    assert "features.1.1.attn.proj" not in model.module_names


def test_every_module_name_is_tappable(swin_t):
    """Contract: every advertised module name yields a batch-leading tap."""
    model, params = swin_t
    x = jnp.zeros((2, 56, 56, 3), jnp.float32)
    names = tuple(model.module_names)
    _, taps = model.apply(params, x, tap_names=names)
    missing = [n for n in names if n not in taps]
    assert not missing, f"advertised but never tapped: {missing}"
    bad = {n: v.shape for n, v in taps.items() if v.shape[0] != 2}
    assert not bad, f"taps whose leading axis is not batch: {bad}"


def test_forward_shapes_and_taps(swin_t):
    model, params = swin_t
    x = np.random.default_rng(0).normal(size=(2, 56, 56, 3)).astype(np.float32)
    logits, taps = model.apply(
        params, jnp.asarray(x), tap_names=("features.1", "features.5", "features.7", "norm")
    )
    assert logits.shape == (2, 10)
    # 56 → 14 (patch 4) → 7 → 4 (odd merge pads) → 2
    assert taps["features.1"].shape == (2, 14, 14, 96)
    assert taps["features.5"].shape == (2, 4, 4, 384)
    assert taps["features.7"].shape == (2, 2, 2, 768)
    assert taps["norm"].shape == (2, 2, 2, 768)


def test_headless(swin_t):
    model = SwinTransformer("tiny", num_classes=0, dtype=jnp.float32)
    assert "head" not in model.module_names
    params = model.init(jax.random.PRNGKey(1))
    feats, _ = model.apply(params, jnp.zeros((1, 56, 56, 3), jnp.float32))
    assert feats.shape == (1, 768)


def test_validate_layers_and_variants(swin_t):
    model, _ = swin_t
    validate_layers(model, ["features.3", "features.5.2.mlp"])
    with pytest.raises(ValueError):
        validate_layers(model, ["features.9"])
    with pytest.raises(ValueError):
        SwinTransformer("huge")
    s = SwinTransformer("small", num_classes=0)
    b = SwinTransformer("base", num_classes=0)
    assert s.depths == (2, 2, 18, 2) and s.num_features == 768
    assert b.depths == (2, 2, 18, 2) and b.num_features == 1024


def _build_torch_twin(torch, num_classes=5):
    """Swin-T twin reproducing torchvision's shifted_window_attention
    functional form (pad → clamp-shift → roll → window → rel-bias +
    −100 region mask → merge → unroll → crop)."""
    nn = torch.nn
    F = torch.nn.functional
    g = torch.Generator().manual_seed(0)
    WS, SHIFT = 7, 3

    def randn_(t, scale=0.02):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    def rel_index():
        coords = torch.stack(torch.meshgrid(torch.arange(WS), torch.arange(WS), indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += WS - 1
        rel[:, :, 1] += WS - 1
        rel[:, :, 0] *= 2 * WS - 1
        return rel.sum(-1).flatten()

    REL_INDEX = rel_index()

    class WindowAttention(nn.Module):
        def __init__(self, dim, heads, shifted):
            super().__init__()
            self.dim, self.heads = dim, heads
            self.shift = SHIFT if shifted else 0
            self.qkv = nn.Linear(dim, 3 * dim)
            self.proj = nn.Linear(dim, dim)
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros((2 * WS - 1) ** 2, heads)
            )
            for t in (self.qkv.weight, self.qkv.bias, self.proj.weight, self.proj.bias,
                      self.relative_position_bias_table):
                randn_(t)

        def forward(self, x):  # (B, H, W, C)
            B, H, W, C = x.shape
            pad_b, pad_r = (WS - H % WS) % WS, (WS - W % WS) % WS
            x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
            _, pH, pW, _ = x.shape
            sh = 0 if WS >= pH else self.shift
            sw = 0 if WS >= pW else self.shift
            if sh or sw:
                x = torch.roll(x, (-sh, -sw), dims=(1, 2))
            nh, nw = pH // WS, pW // WS
            T = WS * WS
            x = x.view(B, nh, WS, nw, WS, C).permute(0, 1, 3, 2, 4, 5).reshape(B * nh * nw, T, C)

            qkv = self.qkv(x).reshape(x.size(0), T, 3, self.heads, C // self.heads)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)
            q = q * (C // self.heads) ** -0.5
            attn = q.matmul(k.transpose(-2, -1))
            bias = self.relative_position_bias_table[REL_INDEX].view(T, T, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
            if sh or sw:
                mask = x.new_zeros((pH, pW))
                h_sl = ((0, pH - WS), (pH - WS, pH - sh), (pH - sh, pH))
                w_sl = ((0, pW - WS), (pW - WS, pW - sw), (pW - sw, pW))
                cnt = 0
                for hh in h_sl:
                    for ww in w_sl:
                        mask[hh[0]:hh[1], ww[0]:ww[1]] = cnt
                        cnt += 1
                mw = mask.view(nh, WS, nw, WS).permute(0, 2, 1, 3).reshape(nh * nw, T)
                am = mw.unsqueeze(1) - mw.unsqueeze(2)
                am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
                attn = attn.view(B, nh * nw, self.heads, T, T) + am.unsqueeze(1).unsqueeze(0)
                attn = attn.view(-1, self.heads, T, T)
            attn = F.softmax(attn, dim=-1)
            x = attn.matmul(v).transpose(1, 2).reshape(x.size(0), T, C)
            x = self.proj(x)
            x = x.view(B, nh, nw, WS, WS, C).permute(0, 1, 3, 2, 4, 5).reshape(B, pH, pW, C)
            if sh or sw:
                x = torch.roll(x, (sh, sw), dims=(1, 2))
            return x[:, :H, :W].contiguous()

    class Block(nn.Module):
        def __init__(self, dim, heads, shifted):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = WindowAttention(dim, heads, shifted)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = nn.Sequential(
                nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(4 * dim, dim), nn.Dropout(0.0),
            )
            for m in (self.norm1, self.norm2):
                randn_(m.weight, 0.1)
                with torch.no_grad():
                    m.weight.add_(1.0)
                randn_(m.bias, 0.05)
            randn_(self.mlp[0].weight), randn_(self.mlp[0].bias)
            randn_(self.mlp[3].weight), randn_(self.mlp[3].bias)

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PatchMerging(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.norm = nn.LayerNorm(4 * dim)
            randn_(self.reduction.weight)
            randn_(self.norm.weight, 0.1)
            with torch.no_grad():
                self.norm.weight.add_(1.0)
            randn_(self.norm.bias, 0.05)

        def forward(self, x):
            B, H, W, C = x.shape
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
            x0 = x[..., 0::2, 0::2, :]
            x1 = x[..., 1::2, 0::2, :]
            x2 = x[..., 0::2, 1::2, :]
            x3 = x[..., 1::2, 1::2, :]
            x = torch.cat([x0, x1, x2, x3], -1)
            return self.reduction(self.norm(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            dims, depths, heads = 96, (2, 2, 6, 2), (3, 6, 12, 24)
            embed = nn.Conv2d(3, dims, 4, stride=4)
            randn_(embed.weight), randn_(embed.bias)
            ln0 = nn.LayerNorm(dims)
            randn_(ln0.weight, 0.1)
            with torch.no_grad():
                ln0.weight.add_(1.0)
            randn_(ln0.bias, 0.05)
            layers = [nn.Sequential(embed, nn.Identity(), ln0)]
            for stage, depth in enumerate(depths):
                dim = dims * 2**stage
                layers.append(nn.Sequential(
                    *[Block(dim, heads[stage], shifted=b % 2 == 1) for b in range(depth)]
                ))
                if stage < 3:
                    layers.append(PatchMerging(dim))
            self.features = nn.Sequential(*layers)
            self.norm = nn.LayerNorm(768)
            randn_(self.norm.weight, 0.1)
            with torch.no_grad():
                self.norm.weight.add_(1.0)
            randn_(self.norm.bias, 0.05)
            self.head = nn.Linear(768, num_classes)
            randn_(self.head.weight), randn_(self.head.bias)

        def forward(self, x):  # (B, 3, H, W)
            x = self.features[0][0](x).permute(0, 2, 3, 1)  # conv then BHWC
            x = self.features[0][2](x)
            for mod in self.features[1:]:
                x = mod(x)
            x = self.norm(x)
            return self.head(x.mean(dim=(1, 2)))

    return Net().eval()


def test_swin_torch_parity():
    """Full-depth Swin-T twin (shifted windows, −100 region masks, odd-size
    patch merging, window≥size shift clamp) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 56, 56, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = SwinTransformer("tiny", num_classes=5, dtype=jnp.float32)
    sd = tmodel.state_dict()
    # The twin's Conv2d carries no name-mangled differences: keys already match
    # torchvision's (features.0.0.weight, features.1.0.attn.qkv.weight, ...).
    params = m.load_torch_state_dict(sd)
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("features.5",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["features.5"].shape == (2, 4, 4, 384)


def test_lrp_conservation_through_swin_block():
    """ε composite conserves relevance through a shifted Swin block:
    detached-LN, CP-LRP window attention, proportional residual splits."""
    from semanticlens_tpu.models.layers import lrp_composite

    model = SwinTransformer("tiny", num_classes=0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(2))
    params = {k: (jnp.zeros_like(v) if k.endswith(".bias") else v) for k, v in params.items()}

    from semanticlens_tpu.models.base import TapCollector

    def block(x):
        return model._block(params, x, "features.1.1", 3, 3, TapCollector(()))

    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 14, 14, 96)).astype(np.float32))
    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(block, x)
        (r_in,) = vjp_fn(out)
    np.testing.assert_allclose(
        float(np.asarray(r_in, np.float64).sum()),
        float(np.asarray(out, np.float64).sum()),
        rtol=5e-2,
    )


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = SwinTransformer("tiny", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "swin-t-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 56, 56, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.3"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["features.3"].activations.shape == (192, 3)
