"""Functional timm-style Vision Transformer with named activation taps.

Subject-model family for transformer-component analysis (BASELINE.md
config 3: ViT-B/16 backbone, MLP/attention components → SigLIP +
text probing). Module and parameter names follow timm's ``VisionTransformer``
(``blocks.3.mlp.fc1`` …) so user layer names and torch checkpoints carry
over; taps yield (B, T, D) token activations for the transformer aggregators
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
    conv2d,
    gelu,
    layer_norm,
    linear,
    residual_add,
    scaled_dot_product_attention,
)


class VisionTransformer(SubjectModel):
    """ViT classifier, channels-last input, timm-compatible names.

    Parameters
    ----------
    image_size, patch_size, width, depth, heads : architecture dims
        (defaults = ViT-B/16).
    num_classes : classifier width (0 → feature output, no head).
    dtype : activation dtype (bfloat16 = MXU-native).
    """

    def __init__(
        self,
        image_size: int = 224,
        patch_size: int = 16,
        width: int = 768,
        depth: int = 12,
        heads: int = 12,
        num_classes: int = 1000,
        dtype=jnp.bfloat16,
    ):
        self.image_size = image_size
        self.patch_size = patch_size
        self.width = width
        self.depth = depth
        self.heads = heads
        self.num_classes = num_classes
        self.dtype = dtype
        self.grid = image_size // patch_size
        self.module_names = tuple(self._enumerate_module_names())

    def _enumerate_module_names(self):
        names = ["patch_embed", "patch_embed.proj", "blocks"]
        for i in range(self.depth):
            p = f"blocks.{i}"
            names += [
                p,
                f"{p}.norm1",
                f"{p}.attn",
                f"{p}.attn.qkv",
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
        return names

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
        return specs

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
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)

        x = conv2d(
            x, params["patch_embed.proj.weight"], params["patch_embed.proj.bias"],
            stride=self.patch_size,
        )
        b, gh, gw, w = x.shape
        x = x.reshape(b, gh * gw, w)
        tap("patch_embed.proj", x)
        tap("patch_embed", x)
        cls = jnp.broadcast_to(params["cls_token"].astype(self.dtype), (b, 1, w))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"].astype(self.dtype)

        for i in range(self.depth):
            p = f"blocks.{i}"
            h = layer_norm(x, params[f"{p}.norm1.weight"], params[f"{p}.norm1.bias"])
            tap(f"{p}.norm1", h)
            qkv = tap(f"{p}.attn.qkv", linear(h, params[f"{p}.attn.qkv.weight"], params[f"{p}.attn.qkv.bias"]))
            q, k, v = qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :]
            h = scaled_dot_product_attention(q, k, v, self.heads)
            h = tap(f"{p}.attn.proj", linear(h, params[f"{p}.attn.proj.weight"], params[f"{p}.attn.proj.bias"]))
            tap(f"{p}.attn", h)
            x = residual_add(x, h)
            h = layer_norm(x, params[f"{p}.norm2.weight"], params[f"{p}.norm2.bias"])
            tap(f"{p}.norm2", h)
            h = tap(f"{p}.mlp.fc1", linear(h, params[f"{p}.mlp.fc1.weight"], params[f"{p}.mlp.fc1.bias"]))
            h = gelu(h, approximate=False)
            h = tap(f"{p}.mlp.fc2", linear(h, params[f"{p}.mlp.fc2.weight"], params[f"{p}.mlp.fc2.bias"]))
            tap(f"{p}.mlp", h)
            x = residual_add(x, h)
            tap(p, x)
        tap("blocks", x)

        x = tap("norm", layer_norm(x, params["norm.weight"], params["norm.bias"]))
        pooled = x[:, 0]
        if self.num_classes:
            logits = tap("head", linear(pooled, params["head.weight"], params["head.bias"]))
            return logits, tap.taps
        return pooled, tap.taps

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a timm ViT state dict (convs OIHW→HWIO, linears transposed)."""
        params = {}
        for name, shape, _ in self._param_specs():
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
            elif name.endswith("weight") and arr.ndim == 2:
                arr = arr.T
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    def __repr__(self):
        return (
            f"VisionTransformer(image_size={self.image_size}, patch_size={self.patch_size}, "
            f"width={self.width}, depth={self.depth}, num_classes={self.num_classes})"
        )
