"""MobileCLIP smoke tests (random weights, reference test strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.foundation_models.mobileclip import (
    MOBILECLIP_PRESETS,
    ClipMobile,
    MobileCLIPConfig,
    init_mobileclip_params,
    mobileclip_encode_image,
)
from semanticlens_tpu.foundation_models.clip import TextCfg


TINY = MobileCLIPConfig(
    embed_dim=16,
    image_size=32,
    depths=(1, 1, 1, 1),
    dims=(8, 16, 24, 32),
    attn_heads=2,
    text=TextCfg(context_length=10, vocab_size=50, width=16, heads=2, layers=1),
)


def test_image_tower_shapes():
    params = init_mobileclip_params(jax.random.PRNGKey(0), TINY)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
    out = np.asarray(mobileclip_encode_image(params, TINY, x))
    assert out.shape == (2, 16)
    assert np.isfinite(out).all()


def test_clipmobile_api():
    import semanticlens_tpu.foundation_models.mobileclip as mc

    old = dict(mc.MOBILECLIP_PRESETS)
    mc.MOBILECLIP_PRESETS["MobileCLIP-S1"] = TINY
    try:
        fm = ClipMobile("s1", dtype=jnp.float32)
        imgs = np.random.default_rng(1).integers(0, 255, size=(2, 48, 48, 3), dtype=np.uint8)
        emb = np.asarray(fm.encode_image(fm.preprocess(imgs)))
        assert emb.shape == (2, 16)
        txt = np.asarray(fm.encode_text(fm.tokenize(["a dog", "a cat"])))
        assert txt.shape == (2, 16)
    finally:
        mc.MOBILECLIP_PRESETS.clear()
        mc.MOBILECLIP_PRESETS.update(old)


def test_unknown_version_raises():
    with pytest.raises(ValueError):
        ClipMobile("s9")


def test_presets_exist():
    assert set(MOBILECLIP_PRESETS) == {"MobileCLIP-S1", "MobileCLIP-S2"}


# ---------------------------------------------------------------------------
# Conversion parity: raw train-form torch mini-model (MobileOne/RepMixer
# branch structure) → load_mobileclip_state_dict → fused JAX tower.
# ---------------------------------------------------------------------------
def _build_torch_trainform(cfg, seed=0):
    torch = pytest.importorskip("torch")
    nn = torch.nn
    g = torch.Generator().manual_seed(seed)

    def randn_(t, scale=0.2):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    def rand_bn(c):
        bn = nn.BatchNorm2d(c).eval()
        with torch.no_grad():
            bn.weight.copy_(torch.rand(c, generator=g) + 0.5)
            bn.bias.copy_(torch.randn(c, generator=g) * 0.1)
            bn.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
            bn.running_var.copy_(torch.rand(c, generator=g) + 0.3)
        return bn

    def conv_bn(cin, cout, k, stride=1, groups=1):
        m = nn.Module()
        m.conv = nn.Conv2d(cin, cout, k, stride=stride, padding=k // 2, groups=groups, bias=False)
        randn_(m.conv.weight)
        m.bn = rand_bn(cout)
        m.forward = lambda x, m=m: m.bn(m.conv(x))
        return m

    class MobileOne(nn.Module):
        """Train-form: n k×k conv+BN branches + 1×1 scale + optional BN skip."""

        def __init__(self, cin, cout, k, stride=1, groups=1, n_conv=2, skip=False):
            super().__init__()
            self.rbr_conv = nn.ModuleList([conv_bn(cin, cout, k, stride, groups) for _ in range(n_conv)])
            self.rbr_scale = conv_bn(cin, cout, 1, stride, groups)
            self.rbr_skip = rand_bn(cout) if skip else None

        def forward(self, x):
            out = sum(m(x) for m in self.rbr_conv) + self.rbr_scale(x)
            if self.rbr_skip is not None:
                out = out + self.rbr_skip(x)
            return out

    class RepMixerTrain(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.mixer = MobileOne(c, c, 3, groups=c, n_conv=1, skip=True)
            self.norm = nn.Module()
            self.norm.rbr_skip = rand_bn(c)
            self.norm.forward = lambda x, m=self.norm: m.rbr_skip(x)

        def forward(self, x):
            return x + self.mixer(x) - self.norm(x)

    class ConvFFN(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.dw = conv_bn(c, c, 7, groups=c)
            self.fc1 = nn.Conv2d(c, 4 * c, 1)
            self.fc2 = nn.Conv2d(4 * c, c, 1)
            randn_(self.fc1.weight), randn_(self.fc1.bias, 0.05)
            randn_(self.fc2.weight), randn_(self.fc2.bias, 0.05)

        def forward(self, x):
            return x + self.fc2(torch.nn.functional.gelu(self.fc1(self.dw(x)), approximate="none"))

    class AttnBlock(nn.Module):
        def __init__(self, c, heads):
            super().__init__()
            self.heads = heads
            self.norm = nn.LayerNorm(c)
            self.attn = nn.Module()
            self.attn.qkv = nn.Linear(c, 3 * c)
            self.attn.proj = nn.Linear(c, c)
            for lin in (self.attn.qkv, self.attn.proj):
                randn_(lin.weight), randn_(lin.bias, 0.05)
            self.ffn = ConvFFN(c)

        def forward(self, x):
            b, c, hh, ww = x.shape
            tokens = x.flatten(2).transpose(1, 2)  # (B, T, C)
            qkv = self.attn.qkv(self.norm(tokens))
            q, k, v = qkv.chunk(3, dim=-1)
            hd = c // self.heads

            def split(t):
                return t.reshape(b, -1, self.heads, hd).transpose(1, 2)

            attn = torch.nn.functional.scaled_dot_product_attention(split(q), split(k), split(v))
            attn = attn.transpose(1, 2).reshape(b, -1, c)
            tokens = self.attn.proj(attn)
            x = x + tokens.transpose(1, 2).reshape(b, c, hh, ww)
            return self.ffn(x)

    class Downsample(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.dw = MobileOne(cin, cin, 7, stride=2, groups=cin, n_conv=1)
            self.pw = conv_bn(cin, cout, 1)

        def forward(self, x):
            return self.pw(self.dw(x))

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            self.stem = nn.ModuleList(
                [MobileOne(3, cfg.dims[0] // 2, 3, stride=2), MobileOne(cfg.dims[0] // 2, cfg.dims[0], 3, stride=2)]
            )
            stages = []
            for s, (depth, mixer) in enumerate(zip(cfg.depths, cfg.mixers)):
                stage = nn.Module()
                if s > 0:
                    stage.downsample = Downsample(cfg.dims[s - 1], cfg.dims[s])
                blocks = []
                for _ in range(depth):
                    if mixer == "rep":
                        block = nn.Module()
                        block.mixer = RepMixerTrain(cfg.dims[s])
                        block.ffn = ConvFFN(cfg.dims[s])
                        block.forward = lambda x, m=block: m.ffn(m.mixer(x))
                        blocks.append(block)
                    else:
                        blocks.append(AttnBlock(cfg.dims[s], cfg.attn_heads))
                stage.blocks = nn.ModuleList(blocks)
                stages.append(stage)
            self.stages = nn.ModuleList(stages)
            self.head = nn.Module()
            self.head.proj = nn.Parameter(torch.empty(cfg.dims[-1], cfg.embed_dim))
            randn_(self.head.proj)

        def forward(self, x):
            gelu = lambda t: torch.nn.functional.gelu(t, approximate="none")
            x = gelu(self.stem[1](gelu(self.stem[0](x))))
            for s, stage in enumerate(self.stages):
                if s > 0:
                    x = stage.downsample(x)
                for block in stage.blocks:
                    x = block(x)
            pooled = x.mean(dim=(2, 3))
            return pooled @ self.head.proj

    return Visual().eval()


def test_trainform_checkpoint_conversion_parity():
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.foundation_models.mobileclip import load_mobileclip_state_dict

    model = _build_torch_trainform(TINY)
    x = torch.randn(2, 3, 32, 32, generator=torch.Generator().manual_seed(42))
    with torch.no_grad():
        want = model(x).numpy()

    sd = {}
    for k, v in model.state_dict().items():
        name = "visual." + k
        # torch module grammar: stem.{i} stays; stages.{s} → stage{s};
        # RepMixer train-form nests as blocks.{b}.mixer.{mixer,norm}
        name = name.replace("stages.", "stage").replace(".head.proj", ".head.proj")
        sd[name] = v.numpy()

    # text side: fabricate torch-layout tensors from a JAX init (inverse relayout)
    jparams = init_mobileclip_params(jax.random.PRNGKey(7), TINY)
    for name, arr in jparams.items():
        if name.startswith("visual."):
            continue
        a = np.asarray(arr)
        if name.endswith("weight") and a.ndim == 2 and "embedding" not in name:
            a = a.T
        sd[name] = a

    params = load_mobileclip_state_dict(TINY, sd)
    got = np.asarray(
        mobileclip_encode_image(params, TINY, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    cos = np.sum(got * want, axis=1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
    assert cos.min() > 0.999, f"cosine parity failed: {cos}"
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_deployed_form_passthrough_equals_trainform_fold():
    """reparam_conv checkpoints and train-form checkpoints land on identical params."""
    torch = pytest.importorskip("torch")
    from semanticlens_tpu.foundation_models.mobileclip import load_mobileclip_state_dict
    from semanticlens_tpu.foundation_models.reparam import fuse_mobileone_block

    c = TINY.dims[0]
    block = _build_torch_trainform(TINY).stem[0]
    sd_train = {f"visual.stem.0.{k}": v.numpy() for k, v in block.state_dict().items()}
    w, b = fuse_mobileone_block(sd_train, "visual.stem.0", channels=TINY.dims[0] // 2, groups=1, k=3)
    sd_dep = {"visual.stem.0.reparam_conv.weight": w, "visual.stem.0.reparam_conv.bias": b}

    x = torch.randn(1, 3, 8, 8)
    got_train = torch.nn.functional.conv2d(
        x, torch.from_numpy(w).float(), torch.from_numpy(b).float(), stride=2, padding=1
    )
    with torch.no_grad():
        want = block(x)
    np.testing.assert_allclose(got_train.numpy(), want.numpy(), rtol=1e-4, atol=1e-4)
