"""FULL-SIZE cross-framework parity: torch twins at real tower dimensions.

Round-2 verdict: mini-model conversion tests can't catch full-size bug
classes (pooling, LN eps, head layout, quick-GELU routing, stage wiring) —
the reference inherits correct towers from open_clip (reference
foundation_models/clip.py:52-62) while this repo re-implements them, so the
BASELINE cosine ≥ 0.999 target (BASELINE.md:18) must be demonstrated at
ViT-B/32 / RN50 / SigLIP2 / MobileCLIP-S1 full depth and width.

Strategy: build pure-torch twins with open_clip/timm state-dict naming at
the REAL configs, randomize weights (including BN running stats), convert
through the production loaders, and assert per-image/text cosine ≥ 0.999
plus elementwise agreement. torch is CPU-only here; one batch of 2 suffices
— the architecture, not the data, is under test.

Only deliberate size reduction: SigLIP's 256k-row vocabulary (a pure
embedding row-gather that cannot hide a layout bug) shrinks to 1k rows to
keep the suite's memory/time budget; every depth/width/head/context/grid
dimension is the real one.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
nn = torch.nn

from semanticlens_tpu.foundation_models.clip import (  # noqa: E402
    CLIP_PRESETS,
    CLIPConfig,
    clip_encode_text,
    load_openclip_state_dict,
    resnet_encode_image,
    vit_encode_image,
)

COS_TARGET = 0.999  # BASELINE.md:18


def _cos(a, b):
    return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


def _assert_parity(got, want, label):
    cos = _cos(got, want)
    assert cos.min() > COS_TARGET, f"{label}: cosine {cos} below {COS_TARGET}"
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=5e-3 * scale, rtol=0, err_msg=label)


def _rand_bn(c, g):
    """BatchNorm with RANDOM running stats — identity stats would mask a
    mean/var wiring bug."""
    bn = nn.BatchNorm2d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.rand(c, generator=g) + 0.5)
        bn.bias.copy_(torch.randn(c, generator=g) * 0.1)
        bn.running_mean.copy_(torch.randn(c, generator=g) * 0.2)
        bn.running_var.copy_(torch.rand(c, generator=g) + 0.3)
    return bn


# --------------------------------------------------------------------------- #
# torch twins (open_clip naming)
# --------------------------------------------------------------------------- #
class _QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class _Block(nn.Module):
    """open_clip ResidualAttentionBlock."""

    def __init__(self, w, h, quick):
        super().__init__()
        self.ln_1 = nn.LayerNorm(w)
        self.attn = nn.MultiheadAttention(w, h, batch_first=True)
        self.ln_2 = nn.LayerNorm(w)
        from collections import OrderedDict

        self.mlp = nn.Sequential(
            OrderedDict(
                [
                    ("c_fc", nn.Linear(w, 4 * w)),
                    ("gelu", _QuickGELU() if quick else nn.GELU()),
                    ("c_proj", nn.Linear(4 * w, w)),
                ]
            )
        )

    def forward(self, x, mask=None):
        h = self.ln_1(x)
        h, _ = self.attn(h, h, h, attn_mask=mask, need_weights=False)
        x = x + h
        return x + self.mlp(self.ln_2(x))


class _Transformer(nn.Module):
    def __init__(self, w, layers, h, quick):
        super().__init__()
        self.resblocks = nn.ModuleList([_Block(w, h, quick) for _ in range(layers)])

    def forward(self, x, mask=None):
        for blk in self.resblocks:
            x = blk(x, mask)
        return x


class _VitVisual(nn.Module):
    def __init__(self, v, embed_dim, quick):
        super().__init__()
        self.conv1 = nn.Conv2d(3, v.width, v.patch_size, v.patch_size, bias=False)
        grid = v.image_size // v.patch_size
        self.class_embedding = nn.Parameter(torch.randn(v.width) * 0.02)
        self.positional_embedding = nn.Parameter(torch.randn(grid * grid + 1, v.width) * 0.02)
        self.ln_pre = nn.LayerNorm(v.width)
        self.transformer = _Transformer(v.width, v.layers, v.heads, quick)
        self.ln_post = nn.LayerNorm(v.width)
        self.proj = nn.Parameter(torch.randn(v.width, embed_dim) * v.width**-0.5)

    def forward(self, x):
        x = self.conv1(x).flatten(2).transpose(1, 2)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.transformer(self.ln_pre(x))
        return self.ln_post(x[:, 0]) @ self.proj


class _Bottleneck(nn.Module):
    """CLIP ModifiedResNet Bottleneck: stride-1 convs + avgpool striding."""

    def __init__(self, cin, planes, stride, g):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _rand_bn(planes, g)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = _rand_bn(planes, g)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _rand_bn(planes * 4, g)
        self.stride = stride
        if stride > 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, bias=False), _rand_bn(planes * 4, g)
            )
        else:
            self.downsample = None

    def forward(self, x):
        identity = x
        out = torch.relu(self.bn1(self.conv1(x)))
        out = torch.relu(self.bn2(self.conv2(out)))
        if self.stride > 1:
            out = torch.nn.functional.avg_pool2d(out, self.stride)
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            if self.stride > 1:
                identity = torch.nn.functional.avg_pool2d(identity, self.stride)
            identity = self.downsample(identity)
        return torch.relu(out + identity)


class _AttnPool2d(nn.Module):
    """CLIP AttentionPool2d: mean-token query, q/k/v/c_proj Linear naming."""

    def __init__(self, spacial, embed_dim, out_dim, g):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial * spacial + 1, embed_dim, generator=g) / embed_dim**0.5
        )
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, out_dim)
        self.num_heads = embed_dim // 64

    def forward(self, x):
        b, c, hh, ww = x.shape
        seq = x.flatten(2).transpose(1, 2)  # (B, HW, C)
        seq = torch.cat([seq.mean(1, keepdim=True), seq], dim=1)
        seq = seq + self.positional_embedding
        q, k, v = self.q_proj(seq[:, :1]), self.k_proj(seq), self.v_proj(seq)
        hd = c // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(1, 2)

        pooled = torch.nn.functional.scaled_dot_product_attention(split(q), split(k), split(v))
        return self.c_proj(pooled.transpose(1, 2).reshape(b, 1, c))[:, 0]


class _RnVisual(nn.Module):
    def __init__(self, v, embed_dim, g):
        super().__init__()
        w = v.resnet_width
        self.conv1 = nn.Conv2d(3, w // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = _rand_bn(w // 2, g)
        self.conv2 = nn.Conv2d(w // 2, w // 2, 3, padding=1, bias=False)
        self.bn2 = _rand_bn(w // 2, g)
        self.conv3 = nn.Conv2d(w // 2, w, 3, padding=1, bias=False)
        self.bn3 = _rand_bn(w, g)
        cin = w
        for stage, n_blocks in enumerate(v.layers, start=1):
            planes = w * (2 ** (stage - 1))
            stride = 1 if stage == 1 else 2
            blocks = []
            for b in range(n_blocks):
                blocks.append(_Bottleneck(cin, planes, stride if b == 0 else 1, g))
                cin = planes * 4
            setattr(self, f"layer{stage}", nn.Sequential(*blocks))
        self.attnpool = _AttnPool2d(v.image_size // 32, cin, embed_dim, g)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = torch.relu(self.bn2(self.conv2(x)))
        x = torch.relu(self.bn3(self.conv3(x)))
        x = torch.nn.functional.avg_pool2d(x, 2)
        for stage in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = stage(x)
        return self.attnpool(x)


class _TextTower(nn.Module):
    """open_clip text side (causal mask, argmax-EOT pooling)."""

    def __init__(self, t, embed_dim, quick):
        super().__init__()
        self.token_embedding = nn.Embedding(t.vocab_size, t.width)
        with torch.no_grad():
            self.token_embedding.weight.mul_(0.02)
        self.positional_embedding = nn.Parameter(torch.randn(t.context_length, t.width) * 0.01)
        self.transformer = _Transformer(t.width, t.layers, t.heads, quick)
        self.ln_final = nn.LayerNorm(t.width)
        self.text_projection = nn.Parameter(torch.randn(t.width, embed_dim) * t.width**-0.5)
        self.logit_scale = nn.Parameter(torch.tensor(2.659))

    def forward(self, tokens):
        x = self.token_embedding(tokens) + self.positional_embedding[: tokens.shape[1]]
        T = tokens.shape[1]
        mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        x = self.ln_final(self.transformer(x, mask))
        eot = tokens.argmax(dim=-1)
        return x[torch.arange(tokens.shape[0]), eot] @ self.text_projection


def _full_clip_twin(cfg: CLIPConfig, seed=0):
    torch.manual_seed(seed)
    g = torch.Generator().manual_seed(seed + 1)
    model = nn.Module()
    if cfg.vision.kind == "vit":
        model.visual = _VitVisual(cfg.vision, cfg.embed_dim, cfg.quick_gelu)
    else:
        model.visual = _RnVisual(cfg.vision, cfg.embed_dim, g)
    text = _TextTower(cfg.text, cfg.embed_dim, cfg.quick_gelu)
    # open_clip flattens the text tower into the top-level namespace
    model.token_embedding = text.token_embedding
    model.positional_embedding = text.positional_embedding
    model.transformer = text.transformer
    model.ln_final = text.ln_final
    model.text_projection = text.text_projection
    model.logit_scale = text.logit_scale
    model._text = text
    return model.eval()


def _clip_inputs(cfg, n=2, seed=5):
    gen = torch.Generator().manual_seed(seed)
    imgs = torch.randn(n, 3, cfg.vision.image_size, cfg.vision.image_size, generator=gen)
    t = cfg.text
    tokens = np.zeros((n, t.context_length), np.int64)
    rng = np.random.default_rng(seed)
    for i, length in enumerate(rng.integers(3, t.context_length, size=n)):
        body = rng.integers(1, t.vocab_size - 2, size=length)
        tokens[i, 0], tokens[i, 1 : 1 + length] = t.vocab_size - 2, body
        tokens[i, 1 + length] = t.vocab_size - 1  # EOT = argmax
    return imgs, torch.from_numpy(tokens)


def _run_clip_parity(preset: str, quick_gelu: bool | None = None):
    cfg = CLIP_PRESETS[preset]
    if quick_gelu is not None:
        cfg = dataclasses.replace(cfg, quick_gelu=quick_gelu)
    model = _full_clip_twin(cfg)
    sd = {k: v for k, v in model.state_dict().items() if not k.startswith("_text.")}
    params = load_openclip_state_dict(cfg, sd)
    imgs, tokens = _clip_inputs(cfg)

    with torch.no_grad():
        want_img = model.visual(imgs).numpy()
        want_txt = model._text(tokens).numpy()

    encode = vit_encode_image if cfg.vision.kind == "vit" else resnet_encode_image
    got_img = np.asarray(encode(params, cfg, jnp.asarray(imgs.numpy().transpose(0, 2, 3, 1))))
    got_txt = np.asarray(clip_encode_text(params, cfg, jnp.asarray(tokens.numpy().astype(np.int32))))

    _assert_parity(got_img, want_img, f"{preset} image tower")
    _assert_parity(got_txt, want_txt, f"{preset} text tower")


# --------------------------------------------------------------------------- #
# The tests
# --------------------------------------------------------------------------- #
def test_vit_b32_fullsize_parity():
    """ViT-B/32 at 224px / 12×768 vision / 12×512 text / 49408 vocab,
    quick-GELU (the OpenAI-pretrained routing)."""
    _run_clip_parity("ViT-B-32")


def test_vit_b32_laion_gelu_routing():
    """Same tower with quick_gelu=False (laion2b routing): catches a
    quick-GELU mix-up that identical routing on both sides would mask."""
    _run_clip_parity("ViT-B-32", quick_gelu=False)


def test_rn50_fullsize_parity():
    """RN50 at full (3,4,6,3) depth with the attention pool — randomized BN
    running stats; the mini-model suite never built this tower in torch."""
    _run_clip_parity("RN50")


def test_siglip2_fullsize_parity():
    from foundation_models.test_siglip import _build_torch_siglip

    from semanticlens_tpu.foundation_models.siglip import (
        SIGLIP_PRESETS,
        load_siglip_state_dict,
        siglip_encode_image,
        siglip_encode_text,
    )

    cfg = dataclasses.replace(SIGLIP_PRESETS["ViT-B-16-SigLIP2"], vocab_size=1024)
    model = _build_torch_siglip(cfg)
    params = load_siglip_state_dict(cfg, dict(model.state_dict()))

    gen = torch.Generator().manual_seed(11)
    x = torch.randn(2, 3, cfg.image_size, cfg.image_size, generator=gen)
    tokens = torch.randint(0, cfg.vocab_size, (2, cfg.context_length), generator=gen)
    with torch.no_grad():
        want_img = model.visual(x).numpy()
        want_txt = model.text(tokens).numpy()

    got_img = np.asarray(
        siglip_encode_image(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    got_txt = np.asarray(siglip_encode_text(params, cfg, jnp.asarray(tokens.numpy())))
    _assert_parity(got_img, want_img, "SigLIP2 B/16 image tower (MAP head)")
    _assert_parity(got_txt, want_txt, "SigLIP2 B/16 text tower")


def test_mobileclip_s1_fullsize_parity():
    from foundation_models.test_mobileclip import _build_torch_trainform

    import jax

    from semanticlens_tpu.foundation_models.mobileclip import (
        MOBILECLIP_PRESETS,
        init_mobileclip_params,
        load_mobileclip_state_dict,
        mobileclip_encode_image,
    )

    cfg = MOBILECLIP_PRESETS["MobileCLIP-S1"]
    model = _build_torch_trainform(cfg)
    # The mini-twin's fixed randn*0.2 init gain compounds over the full 20
    # blocks into float32 overflow; re-init fan-in-scaled (parity doesn't
    # care what the weights ARE, only that both sides use the same ones).
    gen = torch.Generator().manual_seed(20)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, (nn.Conv2d, nn.Linear)):
                # groups are already reflected in weight.shape[1]
                fan_in = mod.weight.shape[1] * (
                    mod.weight.shape[2] * mod.weight.shape[3] if mod.weight.ndim == 4 else 1
                )
                mod.weight.copy_(
                    torch.randn(mod.weight.shape, generator=gen) * fan_in**-0.5
                )
                if mod.bias is not None:
                    mod.bias.copy_(torch.randn(mod.bias.shape, generator=gen) * 0.02)
    gen = torch.Generator().manual_seed(21)
    x = torch.randn(2, 3, cfg.image_size, cfg.image_size, generator=gen)
    with torch.no_grad():
        want = model(x).numpy()

    sd = {}
    for k, v in model.state_dict().items():
        sd["visual." + k.replace("stages.", "stage")] = v.numpy()
    # Text side: the S1 text tower IS the CLIP text transformer already
    # covered at full size by test_vit_b32_fullsize_parity; fabricate
    # torch-layout tensors so the loader's full-spec walk runs.
    for name, arr in init_mobileclip_params(jax.random.PRNGKey(7), cfg).items():
        if name.startswith("visual."):
            continue
        a = np.asarray(arr)
        if name.endswith("weight") and a.ndim == 2 and "embedding" not in name:
            a = a.T
        sd[name] = a

    params = load_mobileclip_state_dict(cfg, sd)
    got = np.asarray(
        mobileclip_encode_image(params, cfg, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    )
    _assert_parity(got, want, "MobileCLIP-S1 image tower (reparam fold)")
