"""Functional Vision Transformer with named activation taps.

Subject-model family for transformer-component analysis (BASELINE.md
config 3: ViT-B/16 backbone, MLP/attention components → SigLIP +
text probing). Module and parameter names follow timm's ``VisionTransformer``
(``blocks.3.mlp.fc1`` …) by default so user layer names and torch checkpoints
carry over; ``naming="torchvision"`` switches the whole surface — module
names, parameter names, checkpoint relayout — to torchvision's
``vit_b_16``-style convention (``conv_proj``,
``encoder.layers.encoder_layer_3.self_attention``, ``heads.head``), with the
packed ``in_proj_weight``/``in_proj_bias`` attention layout. Taps yield
(B, T, D) token activations for the transformer aggregators
(:mod:`semanticlens_tpu.ops.aggregators`).
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import (
    attn_out_projection,
    conv2d,
    gelu,
    layer_norm,
    linear,
    load_torch_params,
    residual_add,
    scaled_dot_product_attention,
)


def _to_torchvision(name: str) -> str | None:
    """Canonical (timm) module/param name → torchvision's, or None for
    names with no torchvision module equivalent (e.g. the fused qkv
    projection — torch's MultiheadAttention has no qkv submodule, its
    packed projection lives in ``in_proj_weight``/``in_proj_bias``)."""
    if name == "patch_embed":
        return None  # torchvision has no patch-embed container module
    if name == "blocks":
        return "encoder.layers"
    if name.startswith("patch_embed.proj"):
        return name.replace("patch_embed.proj", "conv_proj", 1)
    if name == "cls_token":
        return "class_token"
    if name == "pos_embed":
        return "encoder.pos_embedding"
    if name == "norm" or name.startswith("norm."):
        return name.replace("norm", "encoder.ln", 1)
    if name == "head" or name.startswith("head."):
        return name.replace("head", "heads.head", 1)
    if name.startswith("blocks."):
        name = "encoder.layers.encoder_layer_" + name[len("blocks."):]
        name = name.replace(".norm1", ".ln_1").replace(".norm2", ".ln_2")
        if name.endswith(".attn.qkv.weight"):
            return name.replace(".attn.qkv.weight", ".self_attention.in_proj_weight")
        if name.endswith(".attn.qkv.bias"):
            return name.replace(".attn.qkv.bias", ".self_attention.in_proj_bias")
        if name.endswith(".attn.qkv"):
            return None
        name = name.replace(".attn.proj", ".self_attention.out_proj")
        name = name.replace(".attn", ".self_attention")
        name = name.replace(".mlp.fc1", ".mlp.0").replace(".mlp.fc2", ".mlp.3")
        return name
    return name


class VisionTransformer(SubjectModel):
    """ViT classifier, channels-last input, timm-compatible names.

    Parameters
    ----------
    image_size, patch_size, width, depth, heads : architecture dims
        (defaults = ViT-B/16).
    num_classes : classifier width (0 → feature output, no head).
    dtype : activation dtype (bfloat16 = MXU-native).
    naming : "timm" (default) or "torchvision" — selects the module/param
        naming convention AND the matching checkpoint relayout (torchvision
        packs qkv as ``in_proj_weight`` (3D, D)). The computation is
        identical (both are pre-LN ViTs with exact GELU and LN eps 1e-6).
    """

    LN_EPS = 1e-6  # timm and torchvision both use 1e-6 for ViT

    def __init__(
        self,
        image_size: int = 224,
        patch_size: int = 16,
        width: int = 768,
        depth: int = 12,
        heads: int = 12,
        num_classes: int = 1000,
        dtype=jnp.bfloat16,
        naming: str = "timm",
    ):
        if naming not in ("timm", "torchvision"):
            raise ValueError(f"naming must be 'timm' or 'torchvision', got {naming!r}")
        self.image_size = image_size
        self.patch_size = patch_size
        self.width = width
        self.depth = depth
        self.heads = heads
        self.num_classes = num_classes
        self.dtype = dtype
        self.naming = naming
        self.grid = image_size // patch_size
        self.module_names = tuple(self._enumerate_module_names())

    # torchvision classifier zoo: name → (patch, width, depth, heads)
    _TV_VARIANTS = {
        "vit_b_16": (16, 768, 12, 12),
        "vit_b_32": (32, 768, 12, 12),
        "vit_l_16": (16, 1024, 24, 16),
        "vit_l_32": (32, 1024, 24, 16),
        "vit_h_14": (14, 1280, 32, 16),
    }

    @classmethod
    def from_name(cls, name: str, *, image_size: int = 224,
                  num_classes: int = 1000, dtype=jnp.bfloat16):
        """Build a torchvision-named ViT from its zoo name (``vit_b_16`` …)."""
        if name not in cls._TV_VARIANTS:
            raise ValueError(f"name must be one of {sorted(cls._TV_VARIANTS)}, got {name!r}")
        p, w, d, h = cls._TV_VARIANTS[name]
        return cls(image_size=image_size, patch_size=p, width=w, depth=d, heads=h,
                   num_classes=num_classes, dtype=dtype, naming="torchvision")

    def _n(self, name: str) -> str | None:
        """Translate a canonical (timm) name to the active convention."""
        return name if self.naming == "timm" else _to_torchvision(name)

    def _enumerate_module_names(self):
        names = ["patch_embed", "patch_embed.proj", "blocks"]
        for i in range(self.depth):
            p = f"blocks.{i}"
            names += [
                p,
                f"{p}.norm1",
                f"{p}.attn",
                f"{p}.attn.qkv",
                f"{p}.attn.heads",
                f"{p}.attn.proj",
                f"{p}.norm2",
                f"{p}.mlp",
                f"{p}.mlp.fc1",
                f"{p}.mlp.fc2",
            ]
        names += ["norm"]
        if self.num_classes:
            # Headless towers (num_classes=0) never tap "head" — listing it
            # would pass validation and then KeyError in the engine.
            names += ["head"]
        if self.naming == "timm":
            return names
        translated = [t for t in (_to_torchvision(n) for n in names) if t is not None]
        # torchvision-only container modules (tapped in apply):
        translated.insert(0, "encoder")
        if self.num_classes:
            translated.append("heads")
        return translated

    def _param_specs(self):
        w = self.width
        specs = [
            ("cls_token", (1, 1, w), "scaled"),
            ("pos_embed", (1, self.grid * self.grid + 1, w), "scaled"),
            ("patch_embed.proj.weight", (self.patch_size, self.patch_size, 3, w), "patch"),
            ("patch_embed.proj.bias", (w,), "zeros"),
            ("norm.weight", (w,), "ones"),
            ("norm.bias", (w,), "zeros"),
        ]
        for i in range(self.depth):
            p = f"blocks.{i}"
            specs += [
                (f"{p}.norm1.weight", (w,), "ones"),
                (f"{p}.norm1.bias", (w,), "zeros"),
                (f"{p}.attn.qkv.weight", (w, 3 * w), "attn"),
                (f"{p}.attn.qkv.bias", (3 * w,), "zeros"),
                (f"{p}.attn.proj.weight", (w, w), "proj"),
                (f"{p}.attn.proj.bias", (w,), "zeros"),
                (f"{p}.norm2.weight", (w,), "ones"),
                (f"{p}.norm2.bias", (w,), "zeros"),
                (f"{p}.mlp.fc1.weight", (w, 4 * w), "fc"),
                (f"{p}.mlp.fc1.bias", (4 * w,), "zeros"),
                (f"{p}.mlp.fc2.weight", (4 * w, w), "proj"),
                (f"{p}.mlp.fc2.bias", (w,), "zeros"),
            ]
        if self.num_classes:
            specs += [
                ("head.weight", (w, self.num_classes), "proj"),
                ("head.bias", (self.num_classes,), "zeros"),
            ]
        if self.naming == "timm":
            return specs
        return [(_to_torchvision(n), shape, kind) for n, shape, kind in specs]

    def init(self, rng) -> dict[str, jax.Array]:
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            elif kind == "zeros":
                params[name] = jnp.zeros(shape, jnp.float32)
            else:
                fan_in = shape[0] if len(shape) <= 2 else int(np.prod(shape[:-1]))
                std = 0.02 if kind == "scaled" else math.sqrt(1.0 / fan_in)
                params[name] = jax.random.normal(sub, shape, jnp.float32) * std
        return params

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) → (logits, taps). Token taps are (B, T, D)."""
        tapc = TapCollector(tap_names)

        def tap(name, value):
            t = self._n(name)
            return value if t is None else tapc(t, value)

        def p_(key):
            return params[self._n(key)]

        x = x.astype(self.dtype)

        x = conv2d(
            x, p_("patch_embed.proj.weight"), p_("patch_embed.proj.bias"),
            stride=self.patch_size,
        )
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        x = tap("patch_embed.proj", x)
        x = tap("patch_embed", x)
        cls = jnp.broadcast_to(p_("cls_token").astype(self.dtype), (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1) + p_("pos_embed").astype(self.dtype)

        for i in range(self.depth):
            p = f"blocks.{i}"
            h = layer_norm(x, p_(f"{p}.norm1.weight"), p_(f"{p}.norm1.bias"), eps=self.LN_EPS)
            h = tap(f"{p}.norm1", h)
            qkv = tap(f"{p}.attn.qkv", linear(h, p_(f"{p}.attn.qkv.weight"), p_(f"{p}.attn.qkv.bias")))
            q, k, v = qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :]
            h = scaled_dot_product_attention(q, k, v, self.heads)
            # virtual per-HEAD components "{p}.attn.heads" (same contract as
            # models/gpt.py): ‖head output × its W_O slice‖ per token,
            # (B, T, n_heads); interventions rescale each head's
            # contribution (layers.attn_out_projection).
            h = attn_out_projection(
                tapc, self._n(f"{p}.attn.heads"), self._n(f"{p}.attn.proj"), h,
                p_(f"{p}.attn.proj.weight"), p_(f"{p}.attn.proj.bias"), self.heads)
            h = tap(f"{p}.attn", h)
            x = residual_add(x, h)
            h = layer_norm(x, p_(f"{p}.norm2.weight"), p_(f"{p}.norm2.bias"), eps=self.LN_EPS)
            h = tap(f"{p}.norm2", h)
            h = tap(f"{p}.mlp.fc1", linear(h, p_(f"{p}.mlp.fc1.weight"), p_(f"{p}.mlp.fc1.bias")))
            h = gelu(h, approximate=False)
            h = tap(f"{p}.mlp.fc2", linear(h, p_(f"{p}.mlp.fc2.weight"), p_(f"{p}.mlp.fc2.bias")))
            h = tap(f"{p}.mlp", h)
            x = residual_add(x, h)
            x = tap(p, x)
        x = tap("blocks", x)

        x = tap("norm", layer_norm(x, p_("norm.weight"), p_("norm.bias"), eps=self.LN_EPS))
        if self.naming == "torchvision":
            x = tapc("encoder", x)  # torchvision Encoder module output = post-ln
        pooled = x[:, 0]
        if self.num_classes:
            logits = tap("head", linear(pooled, p_("head.weight"), p_("head.bias")))
            if self.naming == "torchvision":
                logits = tapc("heads", logits)
            return logits, tapc.taps
        return pooled, tapc.taps

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torch ViT state dict in the active naming convention:
        timm layout, or torchvision's ``vit_b_16`` layout (packed
        ``in_proj_weight`` (3D, D) transposes to the same (D, 3D) the fused
        qkv projection expects; convs OIHW→HWIO, linears transposed)."""
        return load_torch_params(self._param_specs(), state_dict)

    def __repr__(self):
        return (
            f"VisionTransformer(image_size={self.image_size}, patch_size={self.patch_size}, "
            f"width={self.width}, depth={self.depth}, num_classes={self.num_classes}, "
            f"naming={self.naming!r})"
        )
