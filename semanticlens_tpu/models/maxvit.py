"""Functional torchvision-compatible MaxViT with named taps.

MaxViT (Tu et al., ECCV 2022) is the hybrid MBConv + block/grid-attention
family — the final member of the torchvision classification zoo. Module
and parameter names mirror ``torchvision.models.maxvit_t``
(``blocks.{s}.layers.{i}.layers.{MBconv,window_attention,grid_attention}``,
the stem pair, the LN→Linear→Tanh→Linear classifier), so a reference
user's ``layer_names=["blocks.2"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference
capability: any torch model via forward hooks, reference
activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- every MaxVit layer = MBConv (pre-norm BN, 1×1 expand ×4, 3×3 depthwise
  with the layer's stride, SE at squeeze ratio 0.25 of the EXPANDED
  width with SiLU squeeze, 1×1 project, AvgPool(3,2,1)+1×1 shortcut on
  stride-2) → window attention → grid attention;
- both attention kinds are pre-LN relative-position multi-head attention
  over p² = 49 tokens with a (2p−1)² learned bias table + derived index
  buffer (recomputed here, ignored on load), followed by a pre-LN MLP
  (×4, GELU); residuals around each sub-block;
- **grid attention is window attention with swapped axes**: partition
  into windows of size G/p, then swap the window/token axes so attention
  runs over the p×p decimated lattice (torchvision's SwapAxes trick,
  reproduced exactly);
- the classifier is AdaptiveAvgPool → LayerNorm → Linear → Tanh →
  bias-free Linear;
- feature sizes must stay divisible by the partition size: the canonical
  224² input gives 56/28/14/7 with p=7.

TPU mapping: MBConv as in EfficientNet (1×1 MXU matmuls, depthwise on
the VPU); both attention kinds are ordinary batched (B·nW, heads, 49, 49)
attention on the MXU — the partition/swap/departition reshapes are free
layout ops in XLA.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import (
    avg_pool,
    batch_norm,
    bn_param_specs,
    conv2d,
    gate_scale,
    gelu,
    global_avg_pool,
    layer_norm,
    linear,
    load_torch_params,
    residual_add,
    scaled_dot_product_attention,
)
from semanticlens_tpu.models.swin import _relative_position_index

_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)

# variant -> (stem_ch, block_channels, block_layers, head_dim)
_VARIANTS = {
    "tiny": (64, (64, 128, 256, 512), (2, 2, 5, 2), 32),
}
_EXPANSION = 4
_SQUEEZE = 0.25
_MLP_RATIO = 4
_PARTITION = 7


class MaxViT(SubjectModel):
    """MaxViT-T, channels-last, torchvision-compatible names.

    Parameters
    ----------
    variant : "tiny" (torchvision ships ``maxvit_t``).
    num_classes : classifier width (0 → headless pooled features).
    partition_size : window/grid partition (7 for 224² inputs).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-3  # torchvision: partial(BatchNorm2d, eps=1e-3, momentum=0.01)
    LN_EPS = 1e-5

    def __init__(self, variant: str = "tiny", num_classes: int = 1000, *,
                 partition_size: int = _PARTITION, dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        self.p = partition_size
        self.stem_ch, self.channels, self.layers_per_block, self.head_dim = _VARIANTS[variant]
        self.num_features = self.channels[-1]
        self._rel_index = jnp.asarray(_relative_position_index(self.p))
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _layer_names(self, base: str, c_in: int, c_out: int, stride: int):
        mb = f"{base}.layers.MBconv"
        names = [base, f"{base}.layers", mb]
        if stride != 1 or c_in != c_out:
            names += [f"{mb}.proj", f"{mb}.proj.0", f"{mb}.proj.1"]
        names += [f"{mb}.layers", f"{mb}.layers.pre_norm"]
        for part in ("conv_a", "conv_b"):
            names += [f"{mb}.layers.{part}", f"{mb}.layers.{part}.0",
                      f"{mb}.layers.{part}.1", f"{mb}.layers.{part}.2"]
        se = f"{mb}.layers.squeeze_excitation"
        names += [se, f"{se}.avgpool", f"{se}.fc1", f"{se}.activation",
                  f"{se}.fc2", f"{se}.scale_activation"]
        names += [f"{mb}.layers.conv_c", f"{mb}.stochastic_depth"]
        for kind in ("window_attention", "grid_attention"):
            at = f"{base}.layers.{kind}"
            names += [at, f"{at}.attn_layer", f"{at}.attn_layer.0", f"{at}.attn_layer.1",
                      f"{at}.mlp_layer"] + [f"{at}.mlp_layer.{i}" for i in range(4)]
            names.append(f"{at}.stochastic_depth")
        return names

    def _enumerate_module_names(self):
        names = ["stem", "stem.0", "stem.0.0", "stem.0.1", "stem.0.2",
                 "stem.1", "stem.1.0", "blocks"]
        c_in = self.stem_ch
        for s, (c_out, n_layers) in enumerate(zip(self.channels, self.layers_per_block)):
            names += [f"blocks.{s}", f"blocks.{s}.layers"]
            for i in range(n_layers):
                names += self._layer_names(f"blocks.{s}.layers.{i}",
                                           c_in if i == 0 else c_out, c_out,
                                           2 if i == 0 else 1)
            c_in = c_out
        names.append("classifier")
        names += [f"classifier.{i}" for i in (0, 1, 2)]
        if self.num_classes:
            names += [f"classifier.{i}" for i in (3, 4, 5)]
        return names

    # ----------------------------------------------------------------- specs
    def _ln_specs(self, prefix, ch):
        return [(f"{prefix}.weight", (ch,), "ln_w"), (f"{prefix}.bias", (ch,), "zeros")]

    def _param_specs(self):
        specs = [("stem.0.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += _bn_specs("stem.0.1", self.stem_ch)
        specs += [("stem.1.0.weight", (3, 3, self.stem_ch, self.stem_ch), "conv"),
                  ("stem.1.0.bias", (self.stem_ch,), "zeros")]
        c_in = self.stem_ch
        for s, (c_out, n_layers) in enumerate(zip(self.channels, self.layers_per_block)):
            for i in range(n_layers):
                cin_i = c_in if i == 0 else c_out
                stride = 2 if i == 0 else 1
                base = f"blocks.{s}.layers.{i}.layers"
                mb = f"{base}.MBconv"
                mid = c_out * _EXPANSION
                sqz = int(mid * _SQUEEZE)
                if stride != 1 or cin_i != c_out:
                    specs += [(f"{mb}.proj.1.weight", (1, 1, cin_i, c_out), "conv"),
                              (f"{mb}.proj.1.bias", (c_out,), "zeros")]
                specs += _bn_specs(f"{mb}.layers.pre_norm", cin_i)
                specs += [(f"{mb}.layers.conv_a.0.weight", (1, 1, cin_i, mid), "conv")]
                specs += _bn_specs(f"{mb}.layers.conv_a.1", mid)
                specs += [(f"{mb}.layers.conv_b.0.weight", (3, 3, 1, mid), "dwconv")]
                specs += _bn_specs(f"{mb}.layers.conv_b.1", mid)
                se = f"{mb}.layers.squeeze_excitation"
                specs += [
                    (f"{se}.fc1.weight", (mid, sqz), "se_fc"),
                    (f"{se}.fc1.bias", (sqz,), "zeros"),
                    (f"{se}.fc2.weight", (sqz, mid), "se_fc"),
                    (f"{se}.fc2.bias", (mid,), "zeros"),
                ]
                specs += [(f"{mb}.layers.conv_c.weight", (1, 1, mid, c_out), "conv"),
                          (f"{mb}.layers.conv_c.bias", (c_out,), "zeros")]
                heads = c_out // self.head_dim
                for kind in ("window_attention", "grid_attention"):
                    at = f"{base}.{kind}"
                    specs += self._ln_specs(f"{at}.attn_layer.0", c_out)
                    specs += [
                        (f"{at}.attn_layer.1.to_qkv.weight", (c_out, 3 * c_out), "linear"),
                        (f"{at}.attn_layer.1.to_qkv.bias", (3 * c_out,), "zeros"),
                        (f"{at}.attn_layer.1.merge.weight", (c_out, c_out), "linear"),
                        (f"{at}.attn_layer.1.merge.bias", (c_out,), "zeros"),
                        (f"{at}.attn_layer.1.relative_position_bias_table",
                         ((2 * self.p - 1) ** 2, heads), "zeros"),
                    ]
                    specs += self._ln_specs(f"{at}.mlp_layer.0", c_out)
                    specs += [
                        (f"{at}.mlp_layer.1.weight", (c_out, _MLP_RATIO * c_out), "linear"),
                        (f"{at}.mlp_layer.1.bias", (_MLP_RATIO * c_out,), "zeros"),
                        (f"{at}.mlp_layer.3.weight", (_MLP_RATIO * c_out, c_out), "linear"),
                        (f"{at}.mlp_layer.3.bias", (c_out,), "zeros"),
                    ]
            c_in = c_out
        d = self.num_features
        specs += self._ln_specs("classifier.2", d)
        if self.num_classes:
            specs += [
                ("classifier.3.weight", (d, d), "linear"),
                ("classifier.3.bias", (d,), "zeros"),
                ("classifier.5.weight", (d, self.num_classes), "linear"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """Normal(0.02) linears/bias tables (torchvision's trunc-normal
        approximation), kaiming fan-out convs, unit norms."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind in ("conv", "dwconv"):
                fan_out = shape[0] * shape[1] * shape[3]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "se_fc":
                fan_out = shape[1]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "linear":
                params[name] = (
                    jax.random.truncated_normal(sub, -2.0, 2.0, shape, jnp.float32) * 0.02
                )
            elif kind in ("bn_w", "ln_w"):
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision MaxVit state dict: convs OIHW→HWIO
        (depthwise via the same transpose), SE 1×1 convs squeezed to
        (in, out) linears, attention/MLP Linears transposed;
        ``relative_position_index`` buffers are derived and ignored."""
        return load_torch_params(self._param_specs(), state_dict)

    # ----------------------------------------------------------------- apply
    def _bn(self, params, prefix, x):
        return batch_norm(
            x,
            params[f"{prefix}.weight"],
            params[f"{prefix}.bias"],
            params[f"{prefix}.running_mean"],
            params[f"{prefix}.running_var"],
            eps=self.BN_EPS,
        )

    def _ln(self, params, prefix, x):
        return layer_norm(x, params[f"{prefix}.weight"], params[f"{prefix}.bias"],
                          eps=self.LN_EPS)

    def _mbconv(self, params, x, mb, c_in, c_out, stride, tap):
        if stride != 1 or c_in != c_out:
            sc = tap(f"{mb}.proj.0", avg_pool(x, window=3, stride=stride, padding=1)
                     if stride == 2 else x)
            sc = tap(f"{mb}.proj.1", conv2d(sc, params[f"{mb}.proj.1.weight"],
                                            params[f"{mb}.proj.1.bias"]))
            sc = tap(f"{mb}.proj", sc)
        else:
            sc = x
        h = tap(f"{mb}.layers.pre_norm", self._bn(params, f"{mb}.layers.pre_norm", x))
        for part, kernel, stride_p, groups in (
            ("conv_a", 1, 1, 1),
            ("conv_b", 3, stride, -1),
        ):
            p = f"{mb}.layers.{part}"
            g = h.shape[-1] if groups == -1 else groups
            h = tap(f"{p}.0", conv2d(h, params[f"{p}.0.weight"], stride=stride_p,
                                     padding=(kernel - 1) // 2, groups=g))
            h = tap(f"{p}.1", self._bn(params, f"{p}.1", h))
            h = tap(f"{p}.2", gelu(h))
            h = tap(p, h)
        se = f"{mb}.layers.squeeze_excitation"
        pooled = tap(f"{se}.avgpool", global_avg_pool(h))
        s = pooled.reshape(pooled.shape[0], -1)
        s = tap(f"{se}.fc1", linear(s, params[f"{se}.fc1.weight"], params[f"{se}.fc1.bias"]))
        s = tap(f"{se}.activation", jax.nn.silu(s))
        s = tap(f"{se}.fc2", linear(s, params[f"{se}.fc2.weight"], params[f"{se}.fc2.bias"]))
        s = tap(f"{se}.scale_activation", jax.nn.sigmoid(s))
        h = tap(se, gate_scale(h, s[:, None, None, :]))
        h = tap(f"{mb}.layers.conv_c",
                conv2d(h, params[f"{mb}.layers.conv_c.weight"], params[f"{mb}.layers.conv_c.bias"]))
        h = tap(f"{mb}.layers", h)
        h = tap(f"{mb}.stochastic_depth", h)  # identity at inference
        return tap(mb, residual_add(sc, h))

    def _partition(self, x, q: int):
        """(B, H, W, C) → (B·nW, q², C) windows of size q."""
        b, h, w, c = x.shape
        nh, nw = h // q, w // q
        return (x.reshape(b, nh, q, nw, q, c).transpose(0, 1, 3, 2, 4, 5)
                .reshape(b * nh * nw, q * q, c)), (b, nh, nw)

    def _departition(self, x, q: int, dims):
        b, nh, nw = dims
        c = x.shape[-1]
        return (x.reshape(b, nh, nw, q, q, c).transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, nh * q, nw * q, c))

    def _attention(self, params, xw, at, heads):
        """Relative-position MHA over (N, T, C) token groups; T = p².
        Routed through the shared fused-attention helper, which carries
        CP-LRP under attribution (probabilities as constants)."""
        t, c = xw.shape[-2], xw.shape[-1]
        qkv = linear(xw, params[f"{at}.attn_layer.1.to_qkv.weight"],
                     params[f"{at}.attn_layer.1.to_qkv.bias"])
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        # torchvision quirk: RelativePositionalMultiHeadAttention scales by
        # feat_dim**-0.5 (the FULL channel width), not head_dim**-0.5. The
        # shared helper applies 1/sqrt(head_dim), so pre-scale q by
        # sqrt(head_dim/feat_dim) to land on torchvision's logits exactly.
        head_dim = c // heads
        q = q * math.sqrt(head_dim / c)
        table = params[f"{at}.attn_layer.1.relative_position_bias_table"]
        bias = table[self._rel_index].reshape(t, t, heads).transpose(2, 0, 1)  # (H, T, T)
        out = scaled_dot_product_attention(q, k, v, heads, mask=bias)
        return linear(out, params[f"{at}.attn_layer.1.merge.weight"],
                      params[f"{at}.attn_layer.1.merge.bias"])

    def _partition_attention(self, params, x, at, heads, kind, tap):
        b, h, w, c = x.shape
        p = self.p
        if h % p or w % p:
            raise ValueError(
                f"feature map {h}x{w} not divisible by partition {p} at {at} "
                "(use 224-like input sizes)"
            )
        if kind == "window":
            q = p
            xw, dims = self._partition(x, q)
        else:
            q = h // p  # grid: windows of size G/p, then swap token/window axes
            xw, dims = self._partition(x, q)
            xw = xw.reshape(dims[0], dims[1] * dims[2], q * q, c).swapaxes(1, 2)
            xw = xw.reshape(dims[0] * q * q, dims[1] * dims[2], c)

        def batched(z):  # taps in torchvision's (B, groups, T, C) hook shape
            return z.reshape(b, -1, z.shape[-2], z.shape[-1])

        # taps record torchvision's (B, groups, T, C) hook shape; the
        # return value feeds forward through the inverse reshape so
        # interventions on any of these names are causal
        def windowed(z):
            return z.reshape(-1, z.shape[-2], z.shape[-1])

        n1 = self._ln_tokens(params, f"{at}.attn_layer.0", xw)
        n1 = windowed(tap(f"{at}.attn_layer.0", batched(n1)))
        hh = self._attention(params, n1, at, heads)
        hh = windowed(tap(f"{at}.attn_layer", tap(f"{at}.attn_layer.1", batched(hh))))
        # one StochasticDepth module, applied to both branches (identity at
        # inference; last-hook-wins, same policy as Swin)
        hh = windowed(tap(f"{at}.stochastic_depth", batched(hh)))
        xw = residual_add(xw, hh)  # LRP: proportional split, not a bare +
        m = self._ln_tokens(params, f"{at}.mlp_layer.0", xw)
        m = windowed(tap(f"{at}.mlp_layer.0", batched(m)))
        m = linear(m, params[f"{at}.mlp_layer.1.weight"], params[f"{at}.mlp_layer.1.bias"])
        m = windowed(tap(f"{at}.mlp_layer.1", batched(m)))
        m = gelu(m)
        m = windowed(tap(f"{at}.mlp_layer.2", batched(m)))
        m = linear(m, params[f"{at}.mlp_layer.3.weight"], params[f"{at}.mlp_layer.3.bias"])
        m = windowed(tap(f"{at}.mlp_layer", tap(f"{at}.mlp_layer.3", batched(m))))
        m = windowed(tap(f"{at}.stochastic_depth", batched(m)))
        xw = residual_add(xw, m)

        if kind == "window":
            out = self._departition(xw, q, dims)
        else:
            xw = xw.reshape(dims[0], q * q, dims[1] * dims[2], c).swapaxes(1, 2)
            xw = xw.reshape(dims[0] * dims[1] * dims[2], q * q, c)
            out = self._departition(xw, q, dims)
        return tap(at, out)

    def _ln_tokens(self, params, prefix, x):
        return layer_norm(x, params[f"{prefix}.weight"], params[f"{prefix}.bias"],
                          eps=self.LN_EPS)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = tap("stem.0.0", conv2d(x, params["stem.0.0.weight"], stride=2, padding=1))
        x = tap("stem.0.1", self._bn(params, "stem.0.1", x))
        x = tap("stem.0.2", gelu(x))
        x = tap("stem.0", x)
        x = tap("stem.1.0", conv2d(x, params["stem.1.0.weight"], params["stem.1.0.bias"],
                                   padding=1))
        x = tap("stem.1", x)
        x = tap("stem", x)
        c_in = self.stem_ch
        for s, (c_out, n_layers) in enumerate(zip(self.channels, self.layers_per_block)):
            heads = c_out // self.head_dim
            for i in range(n_layers):
                base = f"blocks.{s}.layers.{i}"
                x = self._mbconv(params, x, f"{base}.layers.MBconv",
                                 c_in if i == 0 else c_out, c_out,
                                 2 if i == 0 else 1, tap)
                x = self._partition_attention(params, x, f"{base}.layers.window_attention",
                                              heads, "window", tap)
                x = self._partition_attention(params, x, f"{base}.layers.grid_attention",
                                              heads, "grid", tap)
                x = tap(base, tap(f"{base}.layers", x))
            x = tap(f"blocks.{s}", tap(f"blocks.{s}.layers", x))
            c_in = c_out
        x = tap("blocks", x)
        x = tap("classifier.0", global_avg_pool(x))
        x = tap("classifier.1", x.reshape(x.shape[0], -1))  # Flatten
        x = tap("classifier.2", self._ln(params, "classifier.2", x))
        if not self.num_classes:
            return x, tap.taps
        x = tap("classifier.3", linear(x, params["classifier.3.weight"], params["classifier.3.bias"]))
        x = tap("classifier.4", jnp.tanh(x))
        logits = linear(x, params["classifier.5.weight"])
        logits = tap("classifier.5", logits)
        return tap("classifier", logits), tap.taps

    def __repr__(self):
        return f"MaxViT(variant={self.variant!r}, num_classes={self.num_classes})"
