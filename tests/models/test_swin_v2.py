"""Structural, tap, and torch-twin parity tests for Swin Transformer V2."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models.swin import SwinTransformerV2, _relative_coords_table


@pytest.fixture(scope="module")
def v2t():
    model = SwinTransformerV2("tiny", num_classes=10, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_structure(v2t):
    model, params = v2t
    assert model.window == 8
    assert "features.1.0.norm1" in model.module_names
    assert "features.1.1.attn.qkv" not in model.module_names  # functional in torch
    # V2 PatchMerging normalizes AFTER reduction: LN width is 2C, not 4C
    assert params["features.2.norm.weight"].shape == (192,)
    assert params["features.1.0.attn.logit_scale"].shape == (3, 1, 1)
    assert params["features.1.0.attn.cpb_mlp.0.weight"].shape == (2, 512)
    # the coords table is log-spaced, symmetric, max |.| = log2(9)/log2(8)
    table = _relative_coords_table(8)
    assert table.shape == ((2 * 8 - 1) ** 2, 2)
    np.testing.assert_allclose(np.abs(table).max(), np.log2(9) / np.log2(8), rtol=1e-6)
    np.testing.assert_allclose(table, -table[::-1], atol=1e-7)


def test_forward_shapes_and_all_taps(v2t):
    model, params = v2t
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    names = tuple(model.module_names)
    logits, taps = model.apply(params, jnp.asarray(x), tap_names=names)
    assert logits.shape == (2, 10)
    assert taps["features.1"].shape == (2, 16, 16, 96)
    assert taps["features.7"].shape == (2, 2, 2, 768)
    missing = [n for n in names if n not in taps]
    assert not missing, missing
    bad = {n: tuple(v.shape) for n, v in taps.items() if v.shape[0] != 2}
    assert not bad, bad


def _build_torch_twin(torch, num_classes=5):
    """Swin-V2-T twin reproducing torchvision's shifted_window_attention_v2
    (cosine attention + clamped logit_scale, CPB MLP with 16·sigmoid,
    post-norm blocks, PatchMergingV2)."""
    nn = torch.nn
    F = torch.nn.functional
    g = torch.Generator().manual_seed(0)
    WS, SHIFT = 8, 4

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

    def coords_table():
        r = torch.arange(-(WS - 1), WS, dtype=torch.float32)
        h, w = torch.meshgrid(r, r, indexing="ij")
        t = torch.stack([h, w], dim=-1).reshape(-1, 2)
        t = t / (WS - 1) * 8
        return torch.sign(t) * torch.log2(1.0 + t.abs()) / np.log2(8)

    REL_INDEX = rel_index()
    TABLE = coords_table()

    class WindowAttentionV2(nn.Module):
        def __init__(self, dim, heads, shifted):
            super().__init__()
            self.dim, self.heads = dim, heads
            self.shift = SHIFT if shifted else 0
            self.qkv = nn.Linear(dim, 3 * dim)
            self.proj = nn.Linear(dim, dim)
            self.logit_scale = nn.Parameter(torch.log(10 * torch.ones(heads, 1, 1)))
            self.cpb_mlp = nn.Sequential(
                nn.Linear(2, 512), nn.ReLU(), nn.Linear(512, heads, bias=False)
            )
            for t in (self.qkv.weight, self.qkv.bias, self.proj.weight, self.proj.bias,
                      self.cpb_mlp[0].weight, self.cpb_mlp[0].bias, self.cpb_mlp[2].weight):
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
            attn = F.normalize(q, dim=-1) @ F.normalize(k, dim=-1).transpose(-2, -1)
            scale = torch.clamp(self.logit_scale, max=np.log(100.0)).exp()
            attn = attn * scale
            bias = 16 * torch.sigmoid(self.cpb_mlp(TABLE))[REL_INDEX].view(T, T, -1)
            attn = attn + bias.permute(2, 0, 1).unsqueeze(0)
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

    def ln_(m):
        randn_(m.weight, 0.1)
        with torch.no_grad():
            m.weight.add_(1.0)
        randn_(m.bias, 0.05)
        return m

    class BlockV2(nn.Module):
        def __init__(self, dim, heads, shifted):
            super().__init__()
            self.norm1 = ln_(nn.LayerNorm(dim))
            self.attn = WindowAttentionV2(dim, heads, shifted)
            self.norm2 = ln_(nn.LayerNorm(dim))
            self.mlp = nn.Sequential(
                nn.Linear(dim, 4 * dim), nn.GELU(), nn.Dropout(0.0),
                nn.Linear(4 * dim, dim), nn.Dropout(0.0),
            )
            randn_(self.mlp[0].weight), randn_(self.mlp[0].bias)
            randn_(self.mlp[3].weight), randn_(self.mlp[3].bias)

        def forward(self, x):  # post-norm
            x = x + self.norm1(self.attn(x))
            return x + self.norm2(self.mlp(x))

    class PatchMergingV2(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
            self.norm = ln_(nn.LayerNorm(2 * dim))
            randn_(self.reduction.weight)

        def forward(self, x):
            B, H, W, C = x.shape
            x = F.pad(x, (0, 0, 0, W % 2, 0, H % 2))
            x = torch.cat([x[..., 0::2, 0::2, :], x[..., 1::2, 0::2, :],
                           x[..., 0::2, 1::2, :], x[..., 1::2, 1::2, :]], -1)
            return self.norm(self.reduction(x))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            dims, depths, heads = 96, (2, 2, 6, 2), (3, 6, 12, 24)
            embed = nn.Conv2d(3, dims, 4, stride=4)
            randn_(embed.weight), randn_(embed.bias)
            ln0 = ln_(nn.LayerNorm(dims))
            layers = [nn.Sequential(embed, nn.Identity(), ln0)]
            for stage, depth in enumerate(depths):
                dim = dims * 2**stage
                layers.append(nn.Sequential(
                    *[BlockV2(dim, heads[stage], shifted=b % 2 == 1) for b in range(depth)]
                ))
                if stage < 3:
                    layers.append(PatchMergingV2(dim))
            self.features = nn.Sequential(*layers)
            self.norm = ln_(nn.LayerNorm(768))
            self.head = nn.Linear(768, num_classes)
            randn_(self.head.weight), randn_(self.head.bias)

        def forward(self, x):  # (B, 3, H, W)
            x = self.features[0][0](x).permute(0, 2, 3, 1)
            x = self.features[0][2](x)
            for mod in self.features[1:]:
                x = mod(x)
            x = self.norm(x)
            return self.head(x.mean(dim=(1, 2)))

    return Net().eval()


def test_swin_v2_torch_parity():
    """Full-depth Swin-V2-T twin (cosine attention, CPB MLP, post-norm,
    PatchMergingV2) converts and matches."""
    torch = pytest.importorskip("torch")
    tmodel = _build_torch_twin(torch)
    x = torch.randn(2, 3, 64, 64, generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        want = tmodel(x).numpy()

    m = SwinTransformerV2("tiny", num_classes=5, dtype=jnp.float32)
    params = m.load_torch_state_dict(tmodel.state_dict())
    got, taps = m.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), ("features.5",))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)
    assert taps["features.5"].shape == (2, 4, 4, 384)


def test_collect_e2e():
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    model = SwinTransformerV2("tiny", num_classes=4, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(4))
    model.name = "swin-v2-t-test"
    ds = ArrayDataset(
        np.random.default_rng(5).normal(size=(8, 64, 64, 3)).astype(np.float32), name="d"
    )
    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=["features.3"], num_samples=3,
        aggregate_fn=aggregate_conv_mean, cache_dir=None,
    )
    cache = cv.run(batch_size=4)
    assert cache["features.3"].activations.shape == (192, 3)
