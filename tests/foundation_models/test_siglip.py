"""SigLIP tower smoke tests (random weights, reference test strategy)."""

import numpy as np

import jax
import jax.numpy as jnp

from semanticlens_tpu.foundation_models.siglip import (
    SigLIPConfig,
    init_siglip_params,
    siglip_encode_image,
    siglip_encode_text,
)

TINY = SigLIPConfig(
    embed_dim=32,
    image_size=16,
    patch_size=8,
    vision_width=32,
    vision_layers=2,
    vision_heads=2,
    text_width=32,
    text_layers=2,
    text_heads=2,
    vocab_size=64,
    context_length=10,
)


def test_siglip_shapes():
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)).astype(np.float32))
    emb = np.asarray(siglip_encode_image(params, TINY, img))
    assert emb.shape == (2, 32)
    assert np.isfinite(emb).all()

    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 64, size=(3, 10)), jnp.int32)
    txt = np.asarray(siglip_encode_text(params, TINY, tokens))
    assert txt.shape == (3, 32)
    assert np.isfinite(txt).all()


def test_siglip_no_cls_token_count():
    """Patch grid only — no class token in the sequence (SigLIP pooling)."""
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    assert params["visual.pos_embed"].shape == (4, 32)  # (16/8)² patches


def test_siglip_image_text_dim_consistency():
    params = init_siglip_params(jax.random.PRNGKey(0), TINY)
    img = jnp.zeros((1, 16, 16, 3), jnp.float32)
    tokens = jnp.zeros((1, 10), jnp.int32)
    d_img = siglip_encode_image(params, TINY, img).shape[-1]
    d_txt = siglip_encode_text(params, TINY, tokens).shape[-1]
    assert d_img == d_txt == TINY.embed_dim


# ---------------------------------------------------------------------------
# Conversion parity: torch mini-SigLIP with timm naming → load_siglip_state_dict
# (mirrors the CLIP strategy in test_clip.py; closes the SigLIP verification
# gap called out by SURVEY §7 / round-1 review).
# ---------------------------------------------------------------------------
def _build_torch_siglip(cfg, seed=0):
    import pytest

    torch = pytest.importorskip("torch")
    nn = torch.nn
    g = torch.Generator().manual_seed(seed)

    def randn_(t, scale=0.15):
        with torch.no_grad():
            t.copy_(torch.randn(t.shape, generator=g) * scale)

    def init_linear(lin):
        randn_(lin.weight)
        randn_(lin.bias, 0.02)
        return lin

    class Block(nn.Module):
        def __init__(self, w, heads):
            super().__init__()
            self.heads = heads
            self.norm1 = nn.LayerNorm(w)
            self.attn = nn.Module()
            self.attn.qkv = init_linear(nn.Linear(w, 3 * w))
            self.attn.proj = init_linear(nn.Linear(w, w))
            self.norm2 = nn.LayerNorm(w)
            self.mlp = nn.Module()
            self.mlp.fc1 = init_linear(nn.Linear(w, 4 * w))
            self.mlp.fc2 = init_linear(nn.Linear(4 * w, w))

        def _attend(self, q, k, v):
            b, t, w = q.shape
            hd = w // self.heads

            def split(x):
                return x.reshape(b, -1, self.heads, hd).transpose(1, 2)

            out = torch.nn.functional.scaled_dot_product_attention(split(q), split(k), split(v))
            return out.transpose(1, 2).reshape(b, -1, w)

        def forward(self, x):
            h = self.norm1(x)
            qkv = self.attn.qkv(h)
            q, k, v = qkv.chunk(3, dim=-1)
            x = x + self.attn.proj(self._attend(q, k, v))
            h = self.norm2(x)
            return x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(h), approximate="none"))

    class AttnPool(nn.Module):
        def __init__(self, w, heads):
            super().__init__()
            self.heads = heads
            self.latent = nn.Parameter(torch.empty(1, w))
            randn_(self.latent)
            self.q = init_linear(nn.Linear(w, w))
            self.kv = init_linear(nn.Linear(w, 2 * w))
            self.proj = init_linear(nn.Linear(w, w))
            self.norm = nn.LayerNorm(w)
            self.mlp = nn.Module()
            self.mlp.fc1 = init_linear(nn.Linear(w, 4 * w))
            self.mlp.fc2 = init_linear(nn.Linear(4 * w, w))

        def forward(self, x):
            b, t, w = x.shape
            hd = w // self.heads
            q = self.q(self.latent.expand(b, 1, w))
            kv = self.kv(x)
            k, v = kv.chunk(2, dim=-1)

            def split(z):
                return z.reshape(b, -1, self.heads, hd).transpose(1, 2)

            pooled = torch.nn.functional.scaled_dot_product_attention(split(q), split(k), split(v))
            pooled = self.proj(pooled.transpose(1, 2).reshape(b, 1, w))[:, 0]
            h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm(pooled)), approximate="none"))
            return pooled + h

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.vision_width
            grid = cfg.image_size // cfg.patch_size
            self.patch_embed = nn.Module()
            self.patch_embed.proj = nn.Conv2d(3, w, cfg.patch_size, stride=cfg.patch_size)
            randn_(self.patch_embed.proj.weight)
            randn_(self.patch_embed.proj.bias, 0.02)
            self.pos_embed = nn.Parameter(torch.empty(1, grid * grid, w))
            randn_(self.pos_embed)
            self.blocks = nn.ModuleList([Block(w, cfg.vision_heads) for _ in range(cfg.vision_layers)])
            self.norm = nn.LayerNorm(w)
            self.attn_pool = AttnPool(w, cfg.vision_heads)

        def forward(self, x):
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            x = x + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.attn_pool(self.norm(x))

    class Text(nn.Module):
        def __init__(self):
            super().__init__()
            w = cfg.text_width
            self.token_embedding = nn.Embedding(cfg.vocab_size, w)
            randn_(self.token_embedding.weight)
            self.positional_embedding = nn.Parameter(torch.empty(cfg.context_length, w))
            randn_(self.positional_embedding)
            self.blocks = nn.ModuleList([Block(w, cfg.text_heads) for _ in range(cfg.text_layers)])
            self.norm = nn.LayerNorm(w)
            self.head = init_linear(nn.Linear(w, cfg.embed_dim))

        def forward(self, tokens):
            x = self.token_embedding(tokens) + self.positional_embedding[: tokens.shape[1]]
            for blk in self.blocks:
                x = blk(x)
            return self.head(self.norm(x)[:, -1])

    class SigLip(nn.Module):
        def __init__(self):
            super().__init__()
            self.visual = Visual()
            self.text = Text()
            self.logit_scale = nn.Parameter(torch.tensor(1.0))
            self.logit_bias = nn.Parameter(torch.tensor(-10.0))

    return SigLip().eval()


def test_torch_checkpoint_conversion_parity():
    import pytest

    torch = pytest.importorskip("torch")
    from semanticlens_tpu.foundation_models.siglip import load_siglip_state_dict

    model = _build_torch_siglip(TINY)
    sd = {k: v for k, v in model.state_dict().items()}
    # timm stores text head weight as Linear (out,in) under text.head.weight —
    # the converter transposes it like every other Linear.
    params = load_siglip_state_dict(TINY, sd)

    x = torch.randn(2, 3, 16, 16, generator=torch.Generator().manual_seed(5))
    tokens = torch.randint(0, TINY.vocab_size, (3, 10), generator=torch.Generator().manual_seed(6))
    with torch.no_grad():
        want_img = model.visual(x).numpy()
        want_txt = model.text(tokens).numpy()

    got_img = np.asarray(siglip_encode_image(params, TINY, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    got_txt = np.asarray(siglip_encode_text(params, TINY, jnp.asarray(tokens.numpy())))

    for got, want in [(got_img, want_img), (got_txt, want_txt)]:
        cos = np.sum(got * want, 1) / (np.linalg.norm(got, axis=1) * np.linalg.norm(want, axis=1))
        assert cos.min() > 0.999, cos
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
