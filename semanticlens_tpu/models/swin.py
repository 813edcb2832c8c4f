"""Functional torchvision-compatible Swin Transformer (v1) with named taps.

Swin-T/S/B: hierarchical windowed attention — the bridge subject between
CNN-style spatial components and ViT-style token components. Module and
parameter names mirror ``torchvision.models.swin_t`` exactly
(``features.{0,2,4,6}`` patch embed / merges, ``features.{1,3,5,7}`` block
stages), so a reference user's ``layer_names=["features.5"]`` works verbatim
and pretrained torchvision checkpoints import with a pure relayout
(reference capability: any torch model via forward hooks, reference
activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- torchvision keeps the tensor in (B, H, W, C) throughout — identical to
  this framework's channels-last layout, so no permutes are needed;
- shifted-window attention pads H/W up to window multiples, **clamps the
  shift to 0 when the window covers the whole (padded) map**, masks
  cross-region window pairs with −100.0 (torchvision's value, not −inf),
  and lets zero-padding tokens attend (torchvision wart, reproduced — the
  canonical 224 input is divisible at every stage so it never fires there);
- ``relative_position_index`` is a derived buffer: recomputed here,
  ignored on checkpoint load;
- PatchMerging concatenates the four parities in torchvision's
  (0::2/0::2, 1::2/0::2, 0::2/1::2, 1::2/1::2) order, then LayerNorm(4C)
  then a bias-free Linear(4C→2C);
- stochastic depth is train-time-only: identity at inference.

TPU mapping: window partition is a free reshape/transpose in XLA;
attention runs through the fused ``jax.nn.dot_product_attention`` path
with the relative-position bias + window mask as a batched additive bias
(layers.scaled_dot_product_attention), so the MXU sees ordinary batched
(nW·B, heads, 49, 49) attention. Under LRP the same call carries CP-LRP
(attention probabilities as constants); LayerNorm carries the
detached-denominator rule (models/layers.py).
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
    load_torch_params,
    residual_add,
    scaled_dot_product_attention,
)

# variant -> (embed_dim, depths, heads)
_VARIANTS = {
    "tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
}
_WINDOW = 7
_PATCH = 4
_MLP_RATIO = 4


def _relative_position_index(ws: int) -> np.ndarray:
    """torchvision ShiftedWindowAttention.define_relative_position_index."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, T, T)
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).reshape(-1)  # (T*T,)


def _shift_region_mask(pad_h: int, pad_w: int, ws: int, sh: int, sw: int) -> np.ndarray:
    """(nW, T, T) additive mask with torchvision's −100.0 fill for
    cross-region pairs in shifted windows (per-axis clamped shifts)."""
    regions = np.zeros((pad_h, pad_w), np.int32)
    cnt = 0
    for hs in ((0, pad_h - ws), (pad_h - ws, pad_h - sh), (pad_h - sh, pad_h)):
        for wslice in ((0, pad_w - ws), (pad_w - ws, pad_w - sw), (pad_w - sw, pad_w)):
            regions[hs[0]:hs[1], wslice[0]:wslice[1]] = cnt
            cnt += 1
    win = regions.reshape(pad_h // ws, ws, pad_w // ws, ws)
    win = win.transpose(0, 2, 1, 3).reshape(-1, ws * ws)  # (nW, T)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinTransformer(SubjectModel):
    """Swin-T/S/B (v1), channels-last, torchvision-compatible names.

    Parameters
    ----------
    variant : "tiny" | "small" | "base".
    num_classes : classifier width (0 → headless pooled features).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    LN_EPS = 1e-5

    def __init__(self, variant: str = "tiny", num_classes: int = 1000, *, dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        self.embed_dim, self.depths, self.heads = _VARIANTS[variant]
        self.num_features = self.embed_dim * 8
        self._rel_index = jnp.asarray(_relative_position_index(_WINDOW))
        self.module_names = tuple(self._enumerate_module_names())

    # ------------------------------------------------------------------ names
    def _enumerate_module_names(self):
        names = ["features", "features.0", "features.0.0", "features.0.1", "features.0.2"]
        fi = 1
        for stage, depth in enumerate(self.depths):
            base = f"features.{fi}"
            names.append(base)
            for b in range(depth):
                # NOTE: ``attn.qkv`` / ``attn.proj`` are deliberately absent:
                # torchvision computes them with F.linear inside the functional
                # shifted_window_attention, so forward hooks on those
                # submodules never fire in the reference either — and their
                # windowed (B*nW, 49, C) layout would break the engine's
                # batch-leading tap contract.
                blk = f"{base}.{b}"
                names += [blk, f"{blk}.norm1", f"{blk}.attn",
                          f"{blk}.stochastic_depth", f"{blk}.norm2",
                          f"{blk}.mlp"] + [f"{blk}.mlp.{i}" for i in range(5)]
            fi += 1
            if stage < len(self.depths) - 1:
                merge = f"features.{fi}"
                names += [merge, f"{merge}.reduction", f"{merge}.norm"]
                fi += 1
        names += ["norm", "permute", "avgpool", "flatten"]
        if self.num_classes:
            names.append("head")
        return names

    # ------------------------------------------------------------------ specs
    @staticmethod
    def _ln_specs(prefix, ch):
        return [(f"{prefix}.weight", (ch,), "ones"), (f"{prefix}.bias", (ch,), "zeros")]

    def _param_specs(self):
        d = self.embed_dim
        specs = [
            ("features.0.0.weight", (_PATCH, _PATCH, 3, d), "conv"),
            ("features.0.0.bias", (d,), "zeros"),
        ]
        specs += self._ln_specs("features.0.2", d)
        fi = 1
        for stage, depth in enumerate(self.depths):
            dim = d * (2**stage)
            heads = self.heads[stage]
            for b in range(depth):
                blk = f"features.{fi}.{b}"
                specs += self._ln_specs(f"{blk}.norm1", dim)
                specs += [
                    (f"{blk}.attn.qkv.weight", (dim, 3 * dim), "linear"),
                    (f"{blk}.attn.qkv.bias", (3 * dim,), "zeros"),
                    (f"{blk}.attn.proj.weight", (dim, dim), "linear"),
                    (f"{blk}.attn.proj.bias", (dim,), "zeros"),
                    (f"{blk}.attn.relative_position_bias_table",
                     ((2 * _WINDOW - 1) ** 2, heads), "zeros"),
                ]
                specs += self._ln_specs(f"{blk}.norm2", dim)
                specs += [
                    (f"{blk}.mlp.0.weight", (dim, _MLP_RATIO * dim), "linear"),
                    (f"{blk}.mlp.0.bias", (_MLP_RATIO * dim,), "zeros"),
                    (f"{blk}.mlp.3.weight", (_MLP_RATIO * dim, dim), "linear"),
                    (f"{blk}.mlp.3.bias", (dim,), "zeros"),
                ]
            fi += 1
            if stage < len(self.depths) - 1:
                merge = f"features.{fi}"
                specs += [(f"{merge}.reduction.weight", (4 * dim, 2 * dim), "linear")]
                specs += self._ln_specs(f"{merge}.norm", 4 * dim)
                fi += 1
        specs += self._ln_specs("norm", self.num_features)
        if self.num_classes:
            specs += [
                ("head.weight", (self.num_features, self.num_classes), "linear"),
                ("head.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme approximated: trunc-normal(0.02) for linears
        and the bias table, unit LayerNorms."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind in ("conv", "linear") or name.endswith("relative_position_bias_table"):
                params[name] = (
                    jax.random.truncated_normal(sub, -2.0, 2.0, shape, jnp.float32) * 0.02
                )
            elif kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision Swin state dict: patch-embed conv OIHW→HWIO,
        Linear weights transposed; ``relative_position_index`` (and, for V2,
        ``relative_coords_table``) buffers are derived state and ignored.
        Inherited unchanged by :class:`SwinTransformerV2` — the relayout is
        driven entirely by ``_param_specs``, which V2 overrides."""
        return load_torch_params(self._param_specs(), state_dict)

    # ------------------------------------------------------------------ apply
    def _ln(self, params, prefix, x):
        return layer_norm(x, params[f"{prefix}.weight"], params[f"{prefix}.bias"], eps=self.LN_EPS)

    def _window_attention(self, params, x, blk, heads, shift, tap):
        """torchvision shifted_window_attention, (B, H, W, C) in/out."""
        b, h, w, c = x.shape
        ws = _WINDOW
        pad_b, pad_r = (ws - h % ws) % ws, (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        ph, pw = h + pad_b, w + pad_r
        sh = 0 if ws >= ph else shift
        sw = 0 if ws >= pw else shift
        if sh or sw:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))

        nh, nw = ph // ws, pw // ws
        t = ws * ws
        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, t, c)

        qkv = linear(xw, params[f"{blk}.attn.qkv.weight"], params[f"{blk}.attn.qkv.bias"])
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]

        table = params[f"{blk}.attn.relative_position_bias_table"]
        rel_bias = table[self._rel_index].reshape(t, t, heads).transpose(2, 0, 1)  # (H, T, T)
        bias = rel_bias[None, :, :, :]  # (1, H, T, T)
        if sh or sw:
            region = jnp.asarray(_shift_region_mask(ph, pw, ws, sh, sw))  # (nW, T, T)
            region = jnp.broadcast_to(region[None, :, None], (b, nh * nw, 1, t, t))
            bias = bias + region.reshape(b * nh * nw, 1, t, t)

        out = scaled_dot_product_attention(q, k, v, heads, mask=bias)
        out = linear(out, params[f"{blk}.attn.proj.weight"], params[f"{blk}.attn.proj.bias"])

        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
        if sh or sw:
            out = jnp.roll(out, (sh, sw), axis=(1, 2))
        if pad_b or pad_r:
            out = out[:, :h, :w]
        return tap(f"{blk}.attn", out)

    def _block(self, params, x, blk, heads, shift, tap):
        h = self._window_attention(params, tap(f"{blk}.norm1", self._ln(params, f"{blk}.norm1", x)),
                                   blk, heads, shift, tap)
        # torchvision applies ONE StochasticDepth module to both branches
        # (identity at inference); tapping both keeps the documented
        # last-hook-wins semantics for shared modules.
        h = tap(f"{blk}.stochastic_depth", h)
        x = residual_add(x, h)  # LRP: proportional split, not a bare +
        n2 = tap(f"{blk}.norm2", self._ln(params, f"{blk}.norm2", x))
        m = tap(f"{blk}.mlp.0", linear(n2, params[f"{blk}.mlp.0.weight"], params[f"{blk}.mlp.0.bias"]))
        m = tap(f"{blk}.mlp.2", tap(f"{blk}.mlp.1", gelu(m)))  # mlp.2: inference-identity Dropout
        m = tap(f"{blk}.mlp.3", linear(m, params[f"{blk}.mlp.3.weight"], params[f"{blk}.mlp.3.bias"]))
        m = tap(f"{blk}.mlp.4", m)  # mlp.4: inference-identity Dropout
        m = tap(f"{blk}.mlp", m)
        m = tap(f"{blk}.stochastic_depth", m)
        return tap(blk, residual_add(x, m))

    def _patch_merge(self, params, x, merge, tap):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        x = tap(f"{merge}.norm", self._ln(params, f"{merge}.norm", x))
        x = tap(f"{merge}.reduction", linear(x, params[f"{merge}.reduction.weight"]))
        return tap(merge, x)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Taps are (B, H', W', C)."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = tap("features.0.0", conv2d(x, params["features.0.0.weight"],
                                       params["features.0.0.bias"], stride=_PATCH))
        x = tap("features.0.1", x)  # torchvision Permute: layout already BHWC
        x = tap("features.0.2", self._ln(params, "features.0.2", x))
        x = tap("features.0", x)
        fi = 1
        for stage, depth in enumerate(self.depths):
            heads = self.heads[stage]
            for b in range(depth):
                shift = 0 if b % 2 == 0 else _WINDOW // 2
                x = self._block(params, x, f"features.{fi}.{b}", heads, shift, tap)
            x = tap(f"features.{fi}", x)
            fi += 1
            if stage < len(self.depths) - 1:
                x = self._patch_merge(params, x, f"features.{fi}", tap)
                fi += 1
        x = tap("features", x)
        x = tap("norm", self._ln(params, "norm", x))
        x = tap("permute", x)  # torchvision Permute to NCHW: stays BHWC here
        x = tap("avgpool", jnp.mean(x, axis=(1, 2)))
        x = tap("flatten", x)
        if self.num_classes:
            logits = linear(x, params["head.weight"], params["head.bias"])
            return tap("head", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        return f"SwinTransformer(variant={self.variant!r}, num_classes={self.num_classes})"


def _relative_coords_table(ws: int) -> np.ndarray:
    """torchvision ShiftedWindowAttentionV2's log-spaced CPB input table:
    (2·ws−1)² rows of (Δh, Δw) normalized to [−1, 1] via /(ws−1), scaled
    ×8, then sign·log2(1+|x|)/log2(8)."""
    rel = np.arange(-(ws - 1), ws, dtype=np.float32)
    h, w = np.meshgrid(rel, rel, indexing="ij")
    table = np.stack([h, w], axis=-1).reshape(-1, 2)  # ((2ws-1)^2, 2)
    table = table / (ws - 1) * 8.0
    return np.sign(table) * np.log2(1.0 + np.abs(table)) / np.log2(8.0)


class SwinTransformerV2(SwinTransformer):
    """Swin-V2-T/S/B, channels-last, torchvision-compatible names.

    The V2 revisions (Liu et al. 2022; torchvision ``swin_v2_{t,s,b}``),
    all reproduced here:

    - **post-normalization**: ``x + stochastic_depth(norm1(attn(x)))`` and
      ``x + stochastic_depth(norm2(mlp(x)))`` (v1 pre-norms);
    - **cosine attention**: q/k are L2-normalized per head and the logits
      scale by the learnable per-head ``logit_scale``, exponentiated and
      clamped at 100 (replaces 1/√d);
    - **continuous position bias**: a 2-layer MLP (``cpb_mlp``: 2→512→
      heads, no bias on the output) over the log-spaced relative-coords
      table, squashed as ``16·sigmoid``; the table and
      ``relative_position_index`` are derived buffers — recomputed here,
      ignored on checkpoint load;
    - **PatchMergingV2** normalizes AFTER the 4C→2C reduction (2C-wide LN);
    - window 8 (torchvision's v2 default; trained at 256²).

    TPU mapping: identical windowed-batch attention as V1; the q/k
    normalize + per-head scale fold into the same fused attention batch,
    and the CPB MLP runs ONCE per apply on a (169, 2) table — negligible.
    """

    _WINDOW_V2 = 8
    _CPB_HIDDEN = 512

    def __init__(self, variant: str = "tiny", num_classes: int = 1000, *, dtype=jnp.bfloat16):
        super().__init__(variant, num_classes, dtype=dtype)
        self._rel_index = jnp.asarray(_relative_position_index(self._WINDOW_V2))
        self._cpb_table = jnp.asarray(_relative_coords_table(self._WINDOW_V2))

    @property
    def window(self) -> int:
        return self._WINDOW_V2

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        d = self.embed_dim
        specs = [
            ("features.0.0.weight", (_PATCH, _PATCH, 3, d), "conv"),
            ("features.0.0.bias", (d,), "zeros"),
        ]
        specs += self._ln_specs("features.0.2", d)
        fi = 1
        for stage, depth in enumerate(self.depths):
            dim = d * (2**stage)
            heads = self.heads[stage]
            for b in range(depth):
                blk = f"features.{fi}.{b}"
                specs += self._ln_specs(f"{blk}.norm1", dim)
                specs += [
                    (f"{blk}.attn.qkv.weight", (dim, 3 * dim), "linear"),
                    (f"{blk}.attn.qkv.bias", (3 * dim,), "zeros"),
                    (f"{blk}.attn.proj.weight", (dim, dim), "linear"),
                    (f"{blk}.attn.proj.bias", (dim,), "zeros"),
                    (f"{blk}.attn.logit_scale", (heads, 1, 1), "logit_scale"),
                    (f"{blk}.attn.cpb_mlp.0.weight", (2, self._CPB_HIDDEN), "linear"),
                    (f"{blk}.attn.cpb_mlp.0.bias", (self._CPB_HIDDEN,), "zeros"),
                    (f"{blk}.attn.cpb_mlp.2.weight", (self._CPB_HIDDEN, heads), "linear"),
                ]
                specs += self._ln_specs(f"{blk}.norm2", dim)
                specs += [
                    (f"{blk}.mlp.0.weight", (dim, _MLP_RATIO * dim), "linear"),
                    (f"{blk}.mlp.0.bias", (_MLP_RATIO * dim,), "zeros"),
                    (f"{blk}.mlp.3.weight", (_MLP_RATIO * dim, dim), "linear"),
                    (f"{blk}.mlp.3.bias", (dim,), "zeros"),
                ]
            fi += 1
            if stage < len(self.depths) - 1:
                merge = f"features.{fi}"
                specs += [(f"{merge}.reduction.weight", (4 * dim, 2 * dim), "linear")]
                specs += self._ln_specs(f"{merge}.norm", 2 * dim)  # V2: LN(2C) after
                fi += 1
        specs += self._ln_specs("norm", self.num_features)
        if self.num_classes:
            specs += [
                ("head.weight", (self.num_features, self.num_classes), "linear"),
                ("head.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "logit_scale":
                params[name] = jnp.full(shape, math.log(10.0), jnp.float32)
            elif kind in ("conv", "linear"):
                params[name] = (
                    jax.random.truncated_normal(sub, -2.0, 2.0, shape, jnp.float32) * 0.02
                )
            elif kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    # ----------------------------------------------------------------- apply
    def _window_attention(self, params, x, blk, heads, shift, tap):
        """torchvision shifted_window_attention_v2, (B, H, W, C) in/out."""
        b, h, w, c = x.shape
        ws = self._WINDOW_V2
        pad_b, pad_r = (ws - h % ws) % ws, (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        ph, pw = h + pad_b, w + pad_r
        sh = 0 if ws >= ph else shift
        sw = 0 if ws >= pw else shift
        if sh or sw:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))

        nh, nw = ph // ws, pw // ws
        t = ws * ws
        xw = x.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, t, c)

        qkv = linear(xw, params[f"{blk}.attn.qkv.weight"], params[f"{blk}.attn.qkv.bias"])
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        hd = c // heads
        bw = q.shape[0]

        # Cosine attention folded into the shared fused helper (which also
        # carries CP-LRP): normalize q/k per head, then pre-scale q by
        # exp(clamp(logit_scale))·√hd so the helper's 1/√hd cancels.
        def heads_split(z):
            return z.reshape(bw, t, heads, hd).astype(jnp.float32)

        qn = heads_split(q)
        kn = heads_split(k)
        qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
        kn = kn / jnp.maximum(jnp.linalg.norm(kn, axis=-1, keepdims=True), 1e-12)
        scale = jnp.exp(jnp.minimum(
            params[f"{blk}.attn.logit_scale"].astype(jnp.float32), math.log(100.0)
        ))  # (H, 1, 1)
        qn = qn * (scale[:, 0, 0] * math.sqrt(hd))[None, None, :, None]
        q2 = qn.reshape(bw, t, c).astype(x.dtype)
        k2 = kn.reshape(bw, t, c).astype(x.dtype)

        # continuous position bias: MLP over the log-coords table, 16·sigmoid
        cpb = jax.nn.relu(
            self._cpb_table @ params[f"{blk}.attn.cpb_mlp.0.weight"]
            + params[f"{blk}.attn.cpb_mlp.0.bias"]
        ) @ params[f"{blk}.attn.cpb_mlp.2.weight"]  # ((2ws-1)^2, heads)
        rel_bias = 16.0 * jax.nn.sigmoid(cpb[self._rel_index].reshape(t, t, heads))
        bias = rel_bias.transpose(2, 0, 1)[None]  # (1, H, T, T)

        if sh or sw:
            region = jnp.asarray(_shift_region_mask(ph, pw, ws, sh, sw))  # (nW, T, T)
            region = jnp.broadcast_to(region[None, :, None], (b, nh * nw, 1, t, t))
            bias = bias + region.reshape(bw, 1, t, t)
        else:
            bias = jnp.broadcast_to(bias, (bw, heads, t, t))

        out = scaled_dot_product_attention(q2, k2, v, heads, mask=bias)
        out = linear(out, params[f"{blk}.attn.proj.weight"], params[f"{blk}.attn.proj.bias"])

        out = out.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5).reshape(b, ph, pw, c)
        if sh or sw:
            out = jnp.roll(out, (sh, sw), axis=(1, 2))
        if pad_b or pad_r:
            out = out[:, :h, :w]
        return tap(f"{blk}.attn", out)

    def _block(self, params, x, blk, heads, shift, tap):
        # V2 post-norm: norm AFTER each branch, residual outside.
        h = self._window_attention(params, x, blk, heads, shift, tap)
        h = tap(f"{blk}.norm1", self._ln(params, f"{blk}.norm1", h))
        h = tap(f"{blk}.stochastic_depth", h)
        x = residual_add(x, h)  # LRP: proportional split, not a bare +
        m = tap(f"{blk}.mlp.0", linear(x, params[f"{blk}.mlp.0.weight"], params[f"{blk}.mlp.0.bias"]))
        m = tap(f"{blk}.mlp.2", tap(f"{blk}.mlp.1", gelu(m)))  # mlp.2: inference-identity Dropout
        m = tap(f"{blk}.mlp.3", linear(m, params[f"{blk}.mlp.3.weight"], params[f"{blk}.mlp.3.bias"]))
        m = tap(f"{blk}.mlp.4", m)  # mlp.4: inference-identity Dropout
        m = tap(f"{blk}.mlp", m)
        m = tap(f"{blk}.norm2", self._ln(params, f"{blk}.norm2", m))
        m = tap(f"{blk}.stochastic_depth", m)
        return tap(blk, residual_add(x, m))

    def _patch_merge(self, params, x, merge, tap):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        )
        # V2: reduction first, THEN LayerNorm(2C)
        x = tap(f"{merge}.reduction", linear(x, params[f"{merge}.reduction.weight"]))
        x = tap(f"{merge}.norm", self._ln(params, f"{merge}.norm", x))
        return tap(merge, x)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Taps are (B, H', W', C)."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = tap("features.0.0", conv2d(x, params["features.0.0.weight"],
                                       params["features.0.0.bias"], stride=_PATCH))
        x = tap("features.0.1", x)  # torchvision Permute: layout already BHWC
        x = tap("features.0.2", self._ln(params, "features.0.2", x))
        x = tap("features.0", x)
        fi = 1
        for stage, depth in enumerate(self.depths):
            heads = self.heads[stage]
            for b in range(depth):
                shift = 0 if b % 2 == 0 else self._WINDOW_V2 // 2
                x = self._block(params, x, f"features.{fi}.{b}", heads, shift, tap)
            x = tap(f"features.{fi}", x)
            fi += 1
            if stage < len(self.depths) - 1:
                x = self._patch_merge(params, x, f"features.{fi}", tap)
                fi += 1
        x = tap("features", x)
        x = tap("norm", self._ln(params, "norm", x))
        x = tap("permute", x)  # torchvision Permute to NCHW: stays BHWC here
        x = tap("avgpool", jnp.mean(x, axis=(1, 2)))
        x = tap("flatten", x)
        if self.num_classes:
            logits = linear(x, params["head.weight"], params["head.bias"])
            return tap("head", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        return f"SwinTransformerV2(variant={self.variant!r}, num_classes={self.num_classes})"
