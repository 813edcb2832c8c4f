"""ConvNeXt subject family: shapes, taps, torch conversion parity, engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from semanticlens_tpu.models import ConvNeXt


@pytest.fixture(scope="module")
def tiny():
    # full preset is heavy for CPU tests — exercise the real class at f32 on
    # small inputs via the "tiny" preset's first blocks by cropping depth? No:
    # use the true tiny preset with a small image; stages handle any H,W%32==0.
    m = ConvNeXt(variant="tiny", num_classes=10, dtype=jnp.float32)
    m.params = m.init(jax.random.PRNGKey(0))
    return m


def test_forward_shapes_and_taps(tiny):
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32))
    logits, taps = tiny.apply(tiny.params, x, ("stem", "stages.0", "stages.3", "stages.1.blocks.0.conv_dw"))
    assert logits.shape == (2, 10)
    assert taps["stem"].shape == (2, 16, 16, 96)
    assert taps["stages.0"].shape == (2, 16, 16, 96)
    assert taps["stages.3"].shape == (2, 2, 2, 768)
    assert taps["stages.1.blocks.0.conv_dw"].shape == (2, 8, 8, 192)


def test_module_names_cover_blocks(tiny):
    names = tiny.module_names
    assert "stages.2.blocks.8" in names and "stages.2.blocks.8.mlp.fc1" in names
    assert "stages.1.downsample.1" in names and "head.fc" in names
    assert not tiny.has_module("stages.0.downsample")  # stage 0 has none


class _TorchConvNeXtBlock(torch.nn.Module):
    """Reference block implementing the same math with timm names."""

    def __init__(self, dim):
        super().__init__()
        self.conv_dw = torch.nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = torch.nn.LayerNorm(dim, eps=1e-6)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(dim, 4 * dim)
        self.mlp.fc2 = torch.nn.Linear(4 * dim, dim)
        self.gamma = torch.nn.Parameter(torch.full((dim,), 1e-6))

    def forward(self, x):  # x: (B, C, H, W)
        h = self.conv_dw(x).permute(0, 2, 3, 1)  # → (B, H, W, C)
        h = self.norm(h)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h)))
        h = h * self.gamma
        return x + h.permute(0, 3, 1, 2)


class _TorchMiniConvNeXt(torch.nn.Module):
    def __init__(self, depths, dims, num_classes):
        super().__init__()
        self.stem = torch.nn.Sequential(
            torch.nn.Conv2d(3, dims[0], 4, stride=4), torch.nn.Identity()
        )
        self.stem_norm = torch.nn.LayerNorm(dims[0], eps=1e-6)
        self.stages = torch.nn.ModuleList()
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stage = torch.nn.Module()
            if i > 0:
                stage.down_norm = torch.nn.LayerNorm(dims[i - 1], eps=1e-6)
                stage.down_conv = torch.nn.Conv2d(dims[i - 1], dim, 2, stride=2)
            stage.blocks = torch.nn.ModuleList(_TorchConvNeXtBlock(dim) for _ in range(depth))
            self.stages.append(stage)
        self.head_norm = torch.nn.LayerNorm(dims[-1], eps=1e-6)
        self.head_fc = torch.nn.Linear(dims[-1], num_classes)

    def forward(self, x):  # (B, 3, H, W)
        x = self.stem[0](x)
        x = self.stem_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        for i, stage in enumerate(self.stages):
            if i > 0:
                x = stage.down_norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.down_conv(x)
            for blk in stage.blocks:
                x = blk(x)
        pooled = x.mean(dim=(2, 3))
        return self.head_fc(self.head_norm(pooled))


def test_torch_conversion_parity():
    """Same weights → same outputs as an equivalent torch model (f32)."""
    depths, dims = (1, 1), (8, 16)
    tm = _TorchMiniConvNeXt(depths, dims, num_classes=5).eval()

    # Build a state dict in OUR naming from the torch module's tensors.
    sd = {
        "stem.0.weight": tm.stem[0].weight,
        "stem.0.bias": tm.stem[0].bias,
        "stem.1.weight": tm.stem_norm.weight,
        "stem.1.bias": tm.stem_norm.bias,
        "head.norm.weight": tm.head_norm.weight,
        "head.norm.bias": tm.head_norm.bias,
        "head.fc.weight": tm.head_fc.weight,
        "head.fc.bias": tm.head_fc.bias,
    }
    for i, stage in enumerate(tm.stages):
        if i > 0:
            sd[f"stages.{i}.downsample.0.weight"] = stage.down_norm.weight
            sd[f"stages.{i}.downsample.0.bias"] = stage.down_norm.bias
            sd[f"stages.{i}.downsample.1.weight"] = stage.down_conv.weight
            sd[f"stages.{i}.downsample.1.bias"] = stage.down_conv.bias
        for j, blk in enumerate(stage.blocks):
            b = f"stages.{i}.blocks.{j}"
            sd[f"{b}.conv_dw.weight"] = blk.conv_dw.weight
            sd[f"{b}.conv_dw.bias"] = blk.conv_dw.bias
            sd[f"{b}.norm.weight"] = blk.norm.weight
            sd[f"{b}.norm.bias"] = blk.norm.bias
            sd[f"{b}.mlp.fc1.weight"] = blk.mlp.fc1.weight
            sd[f"{b}.mlp.fc1.bias"] = blk.mlp.fc1.bias
            sd[f"{b}.mlp.fc2.weight"] = blk.mlp.fc2.weight
            sd[f"{b}.mlp.fc2.bias"] = blk.mlp.fc2.bias
            sd[f"{b}.gamma"] = blk.gamma

    class MiniConvNeXt(ConvNeXt):
        def __init__(self):
            self.variant = "mini"
            self.depths, self.dims = depths, dims
            self.num_classes = 5
            self.dtype = jnp.float32
            self.module_names = tuple(self._enumerate_module_names())

    ours = MiniConvNeXt()
    params = ours.load_torch_state_dict(sd)

    rng = np.random.default_rng(0)
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got, _ = ours.apply(params, jnp.asarray(x), ())
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_torchvision_naming_full_parity():
    """naming="torchvision" exposes convnext_tiny-style names
    (features.N.M.block.K, classifier.2, (C,1,1) layer_scale) and loads a
    torchvision-layout state dict with forward parity against a faithful
    torch twin of torchvision's CNBlock/LayerNorm2d graph."""
    nn = torch.nn
    depths, dims = (1, 1, 1, 1), (8, 12, 16, 20)
    NCLS = 5

    class Permute(nn.Module):
        def __init__(self, order):
            super().__init__()
            self.order = order

        def forward(self, x):
            return x.permute(*self.order)

    class LayerNorm2d(nn.LayerNorm):  # torchvision ops.misc.LayerNorm2d
        def forward(self, x):
            return super().forward(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)

    class CNBlock(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.block = nn.Sequential(
                nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
                Permute([0, 2, 3, 1]),
                nn.LayerNorm(dim, eps=1e-6),
                nn.Linear(dim, 4 * dim),
                nn.GELU(),
                nn.Linear(4 * dim, dim),
                Permute([0, 3, 1, 2]),
            )
            self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

        def forward(self, x):
            return x + self.layer_scale * self.block(x)

    features = [nn.Sequential(
        nn.Conv2d(3, dims[0], 4, stride=4), LayerNorm2d(dims[0], eps=1e-6))]
    for i, (depth, dim) in enumerate(zip(depths, dims)):
        if i > 0:
            features.append(nn.Sequential(
                LayerNorm2d(dims[i - 1], eps=1e-6),
                nn.Conv2d(dims[i - 1], dim, 2, stride=2)))
        features.append(nn.Sequential(*[CNBlock(dim) for _ in range(depth)]))

    class TVConvNeXt(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = nn.Sequential(*features)
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.classifier = nn.Sequential(
                LayerNorm2d(dims[-1], eps=1e-6), nn.Flatten(1),
                nn.Linear(dims[-1], NCLS))

        def forward(self, x):
            return self.classifier(self.avgpool(self.features(x)))

    torch.manual_seed(0)
    twin = TVConvNeXt().eval()
    with torch.no_grad():
        for n, p in twin.named_parameters():
            if "layer_scale" in n:
                p.normal_(0.0, 0.3)  # load-bearing layer scale
            elif p.dim() > 1:
                nn.init.normal_(p, std=0.05)

    class MiniTV(ConvNeXt):
        def __init__(self):
            self.variant = "mini"
            self.depths, self.dims = depths, dims
            self.num_classes = NCLS
            self.dtype = jnp.float32
            self.naming = "torchvision"
            self.module_names = tuple(self._enumerate_module_names())

    ours = MiniTV()
    for n in ["features.0.0", "features.1.0.block.0", "features.1.0.block",
              "features.2.1", "features.7.0", "classifier.2", "avgpool"]:
        assert n in ours.module_names, n
    assert "stem" not in ours.module_names

    params = ours.load_torch_state_dict(twin.state_dict())
    x = np.random.default_rng(7).random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = twin(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got, taps = ours.apply(params, jnp.asarray(x),
                           tap_names=("features.3.0.block.3", "features.7", "avgpool"))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    assert taps["features.3.0.block.3"].shape == (2, 4, 4, 4 * dims[1])
    assert taps["features.7"].shape == (2, 1, 1, dims[3])
    assert taps["avgpool"].shape == (2, dims[3])


def test_from_name_torchvision_presets():
    m = ConvNeXt.from_name("convnext_large", num_classes=0, dtype=jnp.float32)
    assert m.naming == "torchvision" and m.dims == (192, 384, 768, 1536)
    assert "features.5.26.block.5" in m.module_names
    assert "classifier.2" not in m.module_names  # headless
    with pytest.raises(ValueError, match="convnext_tiny"):
        ConvNeXt.from_name("convnext_xxlarge")


def test_engine_integration_and_cache(tmp_path):
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean

    class MiniConvNeXt(ConvNeXt):
        def __init__(self):
            self.variant = "mini"
            self.depths, self.dims = (1, 1), (8, 16)
            self.num_classes = 0
            self.dtype = jnp.float32
            self.module_names = tuple(self._enumerate_module_names())

    model = MiniConvNeXt()
    params = model.init(jax.random.PRNGKey(1))
    ds = ArrayDataset(np.random.default_rng(2).random((12, 16, 16, 3)).astype(np.float32), name="cx")
    engine = CollectEngine(
        model=model, layer_names=("stages.0", "stages.1"),
        aggregation_fn=aggregate_conv_mean, n_collect=3,
    )
    states, n = engine.run(params, ds, 4)
    assert n == 12
    assert states["stages.0"].values.shape == (8, 3)
    assert states["stages.1"].values.shape == (16, 3)
    ids = np.asarray(states["stages.1"].ids)
    assert ids.max() < 12


def test_relevance_attribution_on_convnext(tmp_path):
    """LRP (eps-plus-flat) flows through depthwise convs, LN, and layer scale."""
    from semanticlens_tpu.collect import RelevanceComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset

    class MiniConvNeXt(ConvNeXt):
        def __init__(self):
            self.variant = "mini"
            self.depths, self.dims = (1, 1), (8, 16)
            self.num_classes = 0
            self.dtype = jnp.float32
            self.module_names = tuple(self._enumerate_module_names())

    model = MiniConvNeXt()
    model.params = model.init(jax.random.PRNGKey(3))
    model.name = "mini-convnext"
    ds = ArrayDataset(np.random.default_rng(4).random((10, 16, 16, 3)).astype(np.float32), name="cxr")
    cv = RelevanceComponentVisualizer(
        model=model, dataset=ds, layer_names=["stages.1"], num_samples=3,
        storage_dir=str(tmp_path),
    )
    cv.run(batch_size=5)
    # sum-aggregated activations can be negative for ~half the components
    # (zero-mean LN outputs), which keeps their sentinel slots — reference
    # parity. Attribute two components that actually collected samples.
    ids = cv.get_act_max_sample_ids("stages.1")
    live = np.where((ids >= 0).any(axis=1))[0][:2].tolist()
    assert live, "expected at least one live component"
    refs = cv.get_max_reference(live, "stages.1", n_ref=2, batch_size=8)
    from PIL import Image

    for pils in refs.values():
        assert pils and all(isinstance(p, Image.Image) for p in pils)
