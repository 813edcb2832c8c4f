"""JAX SigLIP (v2-style) vision-language tower.

Covers the reference's ``SigLipV2`` capability (reference:
semanticlens/foundation_models/clip.py:190-211 — a pin of open_clip's
``hf-hub:timm/ViT-B-16-SigLIP2``). Architecture implemented from scratch:

- **Vision**: ViT with no class token, learned positions, standard GELU,
  final LayerNorm, and a MAP attention-pooling head (single learned probe
  query attending over all patch tokens) — timm ``vit_*_siglip`` naming.
- **Text**: non-causal transformer, last-token pooling, dense head.
- Normalization mean/std = (0.5, 0.5, 0.5).

Parameter names follow timm/open_clip SigLIP state dicts so checkpoints
convert by relayout (see :func:`load_siglip_state_dict`).
"""

from __future__ import annotations

import dataclasses
import functools
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.foundation_models.base import AbstractVLM
from semanticlens_tpu.foundation_models.tokenizer import HashTokenizer
from semanticlens_tpu.models.layers import (
    conv2d,
    layer_norm,
    linear,
    scaled_dot_product_attention,
)
from semanticlens_tpu.ops.preprocess import SIGLIP_MEAN, SIGLIP_STD, preprocess_images

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SigLIPConfig:
    embed_dim: int = 768
    image_size: int = 224
    patch_size: int = 16
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    text_width: int = 768
    text_layers: int = 12
    text_heads: int = 12
    vocab_size: int = 256000
    context_length: int = 64


SIGLIP_PRESETS = {
    "ViT-B-16-SigLIP2": SigLIPConfig(),
    "ViT-B-16-SigLIP": SigLIPConfig(vocab_size=32000),
}


def _vit_block(params, prefix, x, heads, *, mask=None):
    """timm Block: norm1 → attn(qkv fused) → norm2 → mlp, residual both."""
    h = layer_norm(x, params[f"{prefix}.norm1.weight"], params[f"{prefix}.norm1.bias"])
    d = x.shape[-1]
    qkv = linear(h, params[f"{prefix}.attn.qkv.weight"], params[f"{prefix}.attn.qkv.bias"])
    q, k, v = qkv[..., :d], qkv[..., d : 2 * d], qkv[..., 2 * d :]
    h = scaled_dot_product_attention(q, k, v, heads, mask=mask)
    h = linear(h, params[f"{prefix}.attn.proj.weight"], params[f"{prefix}.attn.proj.bias"])
    x = x + h
    h = layer_norm(x, params[f"{prefix}.norm2.weight"], params[f"{prefix}.norm2.bias"])
    h = linear(h, params[f"{prefix}.mlp.fc1.weight"], params[f"{prefix}.mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, params[f"{prefix}.mlp.fc2.weight"], params[f"{prefix}.mlp.fc2.bias"])
    return x + h


def siglip_encode_image(params, cfg: SigLIPConfig, images, *, dtype=jnp.float32):
    """(B, H, W, 3) → (B, embed_dim) via MAP attention pooling."""
    x = images.astype(dtype)
    x = conv2d(
        x,
        params["visual.patch_embed.proj.weight"],
        params["visual.patch_embed.proj.bias"],
        stride=cfg.patch_size,
    )
    b, gh, gw, w = x.shape
    x = x.reshape(b, gh * gw, w)
    x = x + params["visual.pos_embed"].astype(dtype)
    for i in range(cfg.vision_layers):
        x = _vit_block(params, f"visual.blocks.{i}", x, cfg.vision_heads)
    x = layer_norm(x, params["visual.norm.weight"], params["visual.norm.bias"])

    # MAP head: one learned probe token cross-attends over the patches.
    probe = jnp.broadcast_to(params["visual.attn_pool.latent"].astype(dtype), (b, 1, w))
    q = linear(probe, params["visual.attn_pool.q.weight"], params["visual.attn_pool.q.bias"])
    kv = linear(x, params["visual.attn_pool.kv.weight"], params["visual.attn_pool.kv.bias"])
    k, v = kv[..., :w], kv[..., w:]
    pooled = scaled_dot_product_attention(q, k, v, cfg.vision_heads)
    pooled = linear(
        pooled, params["visual.attn_pool.proj.weight"], params["visual.attn_pool.proj.bias"]
    )[:, 0]
    h = layer_norm(
        pooled, params["visual.attn_pool.norm.weight"], params["visual.attn_pool.norm.bias"]
    )
    h = linear(h, params["visual.attn_pool.mlp.fc1.weight"], params["visual.attn_pool.mlp.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = linear(h, params["visual.attn_pool.mlp.fc2.weight"], params["visual.attn_pool.mlp.fc2.bias"])
    return (pooled + h).astype(jnp.float32)


def siglip_encode_text(params, cfg: SigLIPConfig, tokens, *, dtype=jnp.float32):
    """(B, T) → (B, embed_dim): non-causal transformer, last-token pooling."""
    x = params["text.token_embedding.weight"].astype(dtype)[tokens]
    x = x + params["text.positional_embedding"].astype(dtype)[: tokens.shape[1]]
    for i in range(cfg.text_layers):
        x = _vit_block(params, f"text.blocks.{i}", x, cfg.text_heads)
    x = layer_norm(x, params["text.norm.weight"], params["text.norm.bias"])
    pooled = x[:, -1]  # SigLIP pools the final token position
    return jnp.matmul(
        pooled.astype(jnp.float32),
        params["text.head.weight"].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    ) + params["text.head.bias"].astype(jnp.float32)


def siglip_param_specs(cfg: SigLIPConfig):
    if cfg.embed_dim != cfg.vision_width:
        # SigLIP's image embedding is the MAP-head output, which stays at
        # vision width; the text head projects text_width → embed_dim.
        raise ValueError(
            f"SigLIP requires embed_dim == vision_width, got {cfg.embed_dim} != {cfg.vision_width}"
        )
    specs = []
    w = cfg.vision_width
    grid = cfg.image_size // cfg.patch_size
    specs += [
        ("visual.patch_embed.proj.weight", (cfg.patch_size, cfg.patch_size, 3, w), "patch"),
        ("visual.patch_embed.proj.bias", (w,), "zeros"),
        ("visual.pos_embed", (grid * grid, w), "scaled"),
        ("visual.norm.weight", (w,), "ones"),
        ("visual.norm.bias", (w,), "zeros"),
        ("visual.attn_pool.latent", (1, w), "scaled"),
        ("visual.attn_pool.q.weight", (w, w), "proj"),
        ("visual.attn_pool.q.bias", (w,), "zeros"),
        ("visual.attn_pool.kv.weight", (w, 2 * w), "proj"),
        ("visual.attn_pool.kv.bias", (2 * w,), "zeros"),
        ("visual.attn_pool.proj.weight", (w, w), "proj"),
        ("visual.attn_pool.proj.bias", (w,), "zeros"),
        ("visual.attn_pool.norm.weight", (w,), "ones"),
        ("visual.attn_pool.norm.bias", (w,), "zeros"),
        ("visual.attn_pool.mlp.fc1.weight", (w, 4 * w), "fc"),
        ("visual.attn_pool.mlp.fc1.bias", (4 * w,), "zeros"),
        ("visual.attn_pool.mlp.fc2.weight", (4 * w, w), "proj"),
        ("visual.attn_pool.mlp.fc2.bias", (w,), "zeros"),
    ]
    for i in range(cfg.vision_layers):
        specs += _block_specs(f"visual.blocks.{i}", w)

    tw = cfg.text_width
    specs += [
        ("text.token_embedding.weight", (cfg.vocab_size, tw), "embed"),
        ("text.positional_embedding", (cfg.context_length, tw), "scaled"),
        ("text.norm.weight", (tw,), "ones"),
        ("text.norm.bias", (tw,), "zeros"),
        ("text.head.weight", (tw, cfg.embed_dim), "proj"),
        ("text.head.bias", (cfg.embed_dim,), "zeros"),
        ("logit_scale", (), "logit_scale_siglip"),
        ("logit_bias", (), "zeros"),
    ]
    for i in range(cfg.text_layers):
        specs += _block_specs(f"text.blocks.{i}", tw)
    return specs


def _block_specs(prefix, w):
    return [
        (f"{prefix}.norm1.weight", (w,), "ones"),
        (f"{prefix}.norm1.bias", (w,), "zeros"),
        (f"{prefix}.attn.qkv.weight", (w, 3 * w), "attn"),
        (f"{prefix}.attn.qkv.bias", (3 * w,), "zeros"),
        (f"{prefix}.attn.proj.weight", (w, w), "proj"),
        (f"{prefix}.attn.proj.bias", (w,), "zeros"),
        (f"{prefix}.norm2.weight", (w,), "ones"),
        (f"{prefix}.norm2.bias", (w,), "zeros"),
        (f"{prefix}.mlp.fc1.weight", (w, 4 * w), "fc"),
        (f"{prefix}.mlp.fc1.bias", (4 * w,), "zeros"),
        (f"{prefix}.mlp.fc2.weight", (4 * w, w), "proj"),
        (f"{prefix}.mlp.fc2.bias", (w,), "zeros"),
    ]


def init_siglip_params(rng, cfg: SigLIPConfig):
    from semanticlens_tpu.foundation_models.common import init_from_specs

    return init_from_specs(rng, siglip_param_specs(cfg))


def load_siglip_state_dict(cfg: SigLIPConfig, state_dict):
    """Relayout a timm/open_clip SigLIP torch state dict into our params."""
    out = {}
    for name, shape, _ in siglip_param_specs(cfg):
        value = state_dict[name]
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        elif name.endswith("weight") and arr.ndim == 2 and "embedding" not in name:
            arr = arr.T
        if name == "visual.pos_embed" and arr.ndim == 3:
            arr = arr[0]
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
        out[name] = jnp.asarray(arr, jnp.float32)
    return out


#: timm-Block dense suffixes (SigLIP naming differs from open_clip's): the
#: fused qkv, attention out-proj and MLP pair — >95% of the tower's FLOPs.
SIGLIP_DENSE_SUFFIXES = (
    ".attn.qkv.weight",
    ".attn.proj.weight",
    ".mlp.fc1.weight",
    ".mlp.fc2.weight",
)


def quantize_siglip_params(params, *, include_text: bool = False):
    """Int8-quantize the SigLIP ViT blocks (see ops/quant.py).

    The MAP attention-pool head and all norms/biases/embeddings stay float;
    SigLIP slices its fused qkv on the OUTPUT side, so no weight-slicing
    support is needed (contrast quantize_clip_params).
    """
    from semanticlens_tpu.ops.quant import quantize_params

    def _match(prefix):
        return lambda k: k.startswith(prefix) and k.endswith(SIGLIP_DENSE_SUFFIXES)

    params = quantize_params(params, _match("visual.blocks."))
    if include_text:
        params = quantize_params(params, _match("text.blocks."))
    return params


class SigLipV2(AbstractVLM):
    """SigLIP v2 foundation model (reference API: clip.py:190-211)."""

    URL = "hf-hub:timm/ViT-B-16-SigLIP2"

    def __init__(
        self,
        *,
        params=None,
        checkpoint=None,
        tokenizer=None,
        tokenizer_path=None,
        dtype=jnp.bfloat16,
        mesh=None,
        seed: int = 0,
        quantize: str | None = None,
        **kwargs,
    ):
        self.url = self.URL
        self.cfg = SIGLIP_PRESETS["ViT-B-16-SigLIP2"]
        self.dtype = dtype
        self.mesh = mesh
        self.name = f"SigLipV2({self.URL})"

        if params is not None:
            self.params = params
        elif checkpoint is not None:
            self.params = load_siglip_state_dict(self.cfg, checkpoint)
        else:
            logger.warning("No weights provided for %s — using random init.", self.URL)
            self.params = init_siglip_params(jax.random.PRNGKey(seed), self.cfg)
        if mesh is not None and "model" in mesh.axis_names and mesh.shape["model"] > 1:
            from semanticlens_tpu.parallel import shard_clip_params, siglip_param_specs_2d

            logger.info("tensor-sharding SigLIP params over %d-way 'model' axis", mesh.shape["model"])
            self.params = shard_clip_params(self.params, mesh, siglip_param_specs_2d(self.cfg))

        # Opt-in int8 inference for the image tower (docs/PERF_NOTES.md).
        self.quantize = quantize
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"Unsupported quantize={quantize!r}; only 'int8'")
            self.params = quantize_siglip_params(self.params)
            # Concept-DB caches key on fm.name (lens.py): segregate from the
            # float twin's caches.
            self.name = f"{self.name}-int8"

        # SigLIP uses a SentencePiece tokenizer. Resolution order: an explicit
        # tokenizer object, an explicit .model path, a locally discovered
        # .model (assets.find_sentencepiece), then the testing fallback.
        if tokenizer is None:
            if tokenizer_path is None:
                from semanticlens_tpu.foundation_models.assets import find_sentencepiece

                tokenizer_path = find_sentencepiece(
                    near=checkpoint if isinstance(checkpoint, (str, Path)) else None,
                    expected_vocab=self.cfg.vocab_size,
                )
            if tokenizer_path is not None:
                from semanticlens_tpu.foundation_models.sentencepiece import SigLipTokenizer

                tokenizer = SigLipTokenizer(tokenizer_path, self.cfg.context_length)
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, self.cfg.context_length)

        @functools.partial(jax.jit)
        def _encode_image(params, images):
            return siglip_encode_image(params, self.cfg, images, dtype=self.dtype)

        @functools.partial(jax.jit)
        def _encode_text(params, tokens):
            return siglip_encode_text(params, self.cfg, tokens, dtype=self.dtype)

        self._encode_image = _encode_image
        self._encode_text = _encode_text

    @property
    def context_length(self):
        return self.cfg.context_length

    @property
    def embed_dim(self):
        return self.cfg.embed_dim

    def __repr__(self):
        return f"{self.__class__.__name__}(url='{self.url}')"

    def preprocess(self, img):
        from semanticlens_tpu.foundation_models.clip import _to_image_batch

        arr = _to_image_batch(img, target_size=self.cfg.image_size)
        return preprocess_images(
            jnp.asarray(arr),
            size=self.cfg.image_size,
            crop=self.cfg.image_size,
            mean=SIGLIP_MEAN,
            std=SIGLIP_STD,
        )

    def encode_image(self, img):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            img = jax.device_put(img, NamedSharding(self.mesh, P("data")))
        return self._encode_image(self.params, img)

    def tokenize(self, txt, context_length=None):
        return jnp.asarray(self.tokenizer(txt, context_length or self.context_length))

    def encode_text(self, text_input):
        return self._encode_text(self.params, jnp.asarray(text_input))
