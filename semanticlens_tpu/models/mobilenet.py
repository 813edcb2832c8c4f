"""Functional torchvision-compatible MobileNetV2 / MobileNetV3 with named taps.

MobileNets are the canonical efficiency-first inverted-residual subjects.
Module and parameter names mirror ``torchvision.models.mobilenet_v2`` /
``mobilenet_v3_large`` / ``mobilenet_v3_small`` exactly, so a reference
user's ``layer_names=["features.12"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference capability:
any torch model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- channel widths go through torchvision's ``_make_divisible(v, 8)``;
  ``width_mult`` scales every block plus the V2 tail's
  ``max(1280, 1280·width)`` rule;
- V2's InvertedResidual packs ``conv.{0,1}`` Conv2dNormActivations then a
  RAW ``Conv2d`` + ``BatchNorm2d`` for the projection (``conv.2``/``conv.3``
  with expansion, ``conv.1``/``conv.2`` without) — V3 instead ends with a
  Conv2dNormActivation whose activation is None (``block.N.{0,1}``);
- V3's BatchNorm eps is 1e-3 (torchvision passes
  ``partial(BatchNorm2d, eps=0.001, momentum=0.01)``); V2 keeps 1e-5;
- V3's SE squeeze width is ``_make_divisible(expanded // 4, 8)`` — of the
  EXPANDED channels, unlike EfficientNet's un-expanded ``c_in // 4`` — with
  ReLU squeeze + Hardsigmoid gate;
- dropout layers are train-time-only: identity at inference, but their
  classifier slots stay hookable names.

TPU mapping: identical codegen classes to EfficientNet — 1×1 expand/project
convs on the MXU, k×k depthwise on the VPU, SE as two tiny vector matmuls
(docs/PERF_NOTES.md "Subject-model zoo"). ReLU6/hardswish carry LRP
pass-through rules (models/layers.py) so attribution conserves through the
saturating clips.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.efficientnet import _make_divisible
from semanticlens_tpu.models.layers import (
    batch_norm,
    bn_param_specs,
    conv2d,
    gate_scale,
    global_avg_pool,
    hardswish,
    linear,
    relu6,
    residual_add,
)

# MobileNetV2 inverted-residual settings: (expand_t, out_ch, repeats, stride)
_V2_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# MobileNetV3 bneck rows: (c_in, kernel, c_expand, c_out, use_se, act, stride)
# act: "RE" = ReLU, "HS" = hardswish (torchvision _mobilenet_v3_conf).
_V3_LARGE = (
    (16, 3, 16, 16, False, "RE", 1),
    (16, 3, 64, 24, False, "RE", 2),
    (24, 3, 72, 24, False, "RE", 1),
    (24, 5, 72, 40, True, "RE", 2),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 5, 120, 40, True, "RE", 1),
    (40, 3, 240, 80, False, "HS", 2),
    (80, 3, 200, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 184, 80, False, "HS", 1),
    (80, 3, 480, 112, True, "HS", 1),
    (112, 3, 672, 112, True, "HS", 1),
    (112, 5, 672, 160, True, "HS", 2),
    (160, 5, 960, 160, True, "HS", 1),
    (160, 5, 960, 160, True, "HS", 1),
)
_V3_SMALL = (
    (16, 3, 16, 16, True, "RE", 2),
    (16, 3, 72, 24, False, "RE", 2),
    (24, 3, 88, 24, False, "RE", 1),
    (24, 5, 96, 40, True, "HS", 2),
    (40, 5, 240, 40, True, "HS", 1),
    (40, 5, 240, 40, True, "HS", 1),
    (40, 5, 120, 48, True, "HS", 1),
    (48, 5, 144, 48, True, "HS", 1),
    (48, 5, 288, 96, True, "HS", 2),
    (96, 5, 576, 96, True, "HS", 1),
    (96, 5, 576, 96, True, "HS", 1),
)
# variant -> (rows, classifier hidden width)
_V3_VARIANTS = {"large": (_V3_LARGE, 1280), "small": (_V3_SMALL, 1024)}


_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)


class _MobileNetBase(SubjectModel):
    """Shared init / torch-relayout / repr for the two generations."""

    bn_eps: float

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme: kaiming-normal fan-out for every Conv2d
        (incl. SE 1×1s), unit BN, normal(0, 0.01) + zero bias for Linears."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind in ("conv", "dwconv"):
                fan_out = shape[0] * shape[1] * shape[3]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "se_fc":
                fan_out = shape[1]  # 1×1 conv in torch: receptive field 1
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "fc":
                params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.01
            elif kind == "bn_w":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision MobileNet state dict: convs OIHW→HWIO
        (depthwise (C,1,k,k) via the same transpose), SE 1×1 convs squeezed
        to (in, out) linears, classifier Linears transposed."""
        params = {}
        for name, shape, kind in self._param_specs():
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if arr.ndim == 4 and (".fc1." in name or ".fc2." in name):
                arr = arr[:, :, 0, 0].T  # (out, in, 1, 1) → (in, out)
            elif arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
            elif name.endswith("weight") and arr.ndim == 2:
                arr = arr.T
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    # One torchvision Conv2dNormActivation: conv → BN → (activation).
    def _cna(self, params, x, prefix, tap, *, stride=1, kernel=1, groups=1, act=None):
        pad = (kernel - 1) // 2
        x = tap(f"{prefix}.0", conv2d(x, params[f"{prefix}.0.weight"], stride=stride,
                                      padding=pad, groups=groups))
        x = batch_norm(
            x,
            params[f"{prefix}.1.weight"],
            params[f"{prefix}.1.bias"],
            params[f"{prefix}.1.running_mean"],
            params[f"{prefix}.1.running_var"],
            eps=self.bn_eps,
        )
        x = tap(f"{prefix}.1", x)
        if act is not None:
            x = tap(f"{prefix}.2", act(x))
        return tap(prefix, x)


class _V2Block:
    """One V2 InvertedResidual after width scaling."""

    def __init__(self, c_in, c_out, expand, stride):
        self.c_in = c_in
        self.c_out = c_out
        self.stride = stride
        self.c_mid = int(round(c_in * expand))
        self.has_expand = expand != 1
        self.i_dw = 1 if self.has_expand else 0
        self.i_proj = self.i_dw + 1  # raw Conv2d
        self.i_bn = self.i_proj + 1  # raw BatchNorm2d
        self.residual = stride == 1 and c_in == c_out


class MobileNetV2(_MobileNetBase):
    """MobileNetV2, channels-last, torchvision-compatible names.

    Parameters
    ----------
    num_classes : classifier width (0 → headless pooled features).
    width_mult : torchvision's channel multiplier (divisible-by-8 rounding).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    bn_eps = 1e-5

    def __init__(self, num_classes: int = 1000, *, width_mult: float = 1.0, dtype=jnp.bfloat16):
        self.num_classes = num_classes
        self.width_mult = width_mult
        self.dtype = dtype
        self.stem_ch = _make_divisible(32 * width_mult)
        self.head_ch = _make_divisible(1280 * max(1.0, width_mult))
        self.blocks: list[_V2Block] = []
        c_in = self.stem_ch
        for t, c, n, s in _V2_STAGES:
            c_out = _make_divisible(c * width_mult)
            for j in range(n):
                self.blocks.append(_V2Block(c_in, c_out, t, s if j == 0 else 1))
                c_in = c_out
        self.num_features = self.head_ch
        self.module_names = tuple(self._enumerate_module_names())

    def _enumerate_module_names(self):
        names = ["features", "features.0", "features.0.0", "features.0.1", "features.0.2"]
        for bi, blk in enumerate(self.blocks, start=1):
            base = f"features.{bi}"
            names += [base, f"{base}.conv"]
            for idx in ([0] if blk.has_expand else []):
                names += [f"{base}.conv.{idx}.{m}" for m in ("", "0", "1", "2")]
            names += [f"{base}.conv.{blk.i_dw}.{m}" for m in ("", "0", "1", "2")]
            names += [f"{base}.conv.{blk.i_proj}", f"{base}.conv.{blk.i_bn}"]
        last = len(self.blocks) + 1
        names += [f"features.{last}", f"features.{last}.0", f"features.{last}.1", f"features.{last}.2"]
        if self.num_classes:
            names += ["classifier", "classifier.0", "classifier.1"]
        return [n.rstrip(".") for n in names]

    def _param_specs(self):
        specs = [("features.0.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += _bn_specs("features.0.1", self.stem_ch)
        for bi, blk in enumerate(self.blocks, start=1):
            base = f"features.{bi}.conv"
            if blk.has_expand:
                specs.append((f"{base}.0.0.weight", (1, 1, blk.c_in, blk.c_mid), "conv"))
                specs += _bn_specs(f"{base}.0.1", blk.c_mid)
            specs.append((f"{base}.{blk.i_dw}.0.weight", (3, 3, 1, blk.c_mid), "dwconv"))
            specs += _bn_specs(f"{base}.{blk.i_dw}.1", blk.c_mid)
            specs.append((f"{base}.{blk.i_proj}.weight", (1, 1, blk.c_mid, blk.c_out), "conv"))
            specs += _bn_specs(f"{base}.{blk.i_bn}", blk.c_out)
        last = len(self.blocks) + 1
        specs.append((f"features.{last}.0.weight", (1, 1, self.blocks[-1].c_out, self.head_ch), "conv"))
        specs += _bn_specs(f"features.{last}.1", self.head_ch)
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (self.head_ch, self.num_classes), "fc"),
                ("classifier.1.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def _inverted_residual(self, params, x, base, blk: _V2Block, tap):
        h = x
        if blk.has_expand:
            h = self._cna(params, h, f"{base}.conv.0", tap, act=relu6)
        h = self._cna(params, h, f"{base}.conv.{blk.i_dw}", tap,
                      stride=blk.stride, kernel=3, groups=blk.c_mid, act=relu6)
        h = tap(f"{base}.conv.{blk.i_proj}",
                conv2d(h, params[f"{base}.conv.{blk.i_proj}.weight"]))
        bn = f"{base}.conv.{blk.i_bn}"
        h = tap(bn, batch_norm(h, params[f"{bn}.weight"], params[f"{bn}.bias"],
                               params[f"{bn}.running_mean"], params[f"{bn}.running_var"],
                               eps=self.bn_eps))
        h = tap(f"{base}.conv", h)
        if blk.residual:
            h = residual_add(x, h)  # LRP: proportional split, not a bare +
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = self._cna(params, x, "features.0", tap, stride=2, kernel=3, act=relu6)
        for bi, blk in enumerate(self.blocks, start=1):
            x = self._inverted_residual(params, x, f"features.{bi}", blk, tap)
        last = len(self.blocks) + 1
        x = self._cna(params, x, f"features.{last}", tap, stride=1, kernel=1, act=relu6)
        x = tap("features", x)
        x = global_avg_pool(x).reshape(x.shape[0], -1)
        x = tap("classifier.0", x)  # dropout: identity at inference
        if self.num_classes:
            logits = linear(x, params["classifier.1.weight"], params["classifier.1.bias"])
            logits = tap("classifier.1", logits)
            return tap("classifier", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        w = f", width_mult={self.width_mult}" if self.width_mult != 1.0 else ""
        return f"MobileNetV2(num_classes={self.num_classes}{w})"


class _V3Block:
    """One V3 bneck row after width scaling."""

    def __init__(self, c_in, kernel, c_mid, c_out, use_se, act, stride, width_mult):
        adjust = lambda c: _make_divisible(c * width_mult)  # noqa: E731
        self.c_in = adjust(c_in)
        self.kernel = kernel
        self.c_mid = adjust(c_mid)
        self.c_out = adjust(c_out)
        self.use_se = use_se
        self.act = act  # "RE" | "HS"
        self.stride = stride
        self.c_se = _make_divisible(self.c_mid // 4) if use_se else 0
        self.has_expand = self.c_mid != self.c_in
        self.i_dw = 1 if self.has_expand else 0
        self.i_se = self.i_dw + 1 if use_se else -1
        self.i_proj = self.i_dw + (2 if use_se else 1)
        self.residual = stride == 1 and self.c_in == self.c_out


class MobileNetV3(_MobileNetBase):
    """MobileNetV3-Large/-Small, channels-last, torchvision-compatible names.

    Parameters
    ----------
    variant : "large" | "small".
    num_classes : classifier width (0 → headless pooled features).
    width_mult : torchvision's channel multiplier.
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    bn_eps = 1e-3  # torchvision: partial(BatchNorm2d, eps=0.001, momentum=0.01)

    def __init__(self, variant: str = "large", num_classes: int = 1000, *,
                 width_mult: float = 1.0, dtype=jnp.bfloat16):
        if variant not in _V3_VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_V3_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.width_mult = width_mult
        self.dtype = dtype
        rows, hidden = _V3_VARIANTS[variant]
        adjust = lambda c: _make_divisible(c * width_mult)  # noqa: E731
        self.stem_ch = adjust(16)
        self.blocks = [_V3Block(*row, width_mult) for row in rows]
        self.head_ch = 6 * self.blocks[-1].c_out  # lastconv_output_channels
        self.hidden_ch = adjust(hidden)  # torchvision adjust_channels(last_channel)
        self.num_features = self.head_ch
        self.module_names = tuple(self._enumerate_module_names())

    def _enumerate_module_names(self):
        names = ["features", "features.0", "features.0.0", "features.0.1", "features.0.2"]
        for bi, blk in enumerate(self.blocks, start=1):
            base = f"features.{bi}"
            names += [base, f"{base}.block"]
            for idx in ([0] if blk.has_expand else []):
                names += [f"{base}.block.{idx}.{m}" for m in ("", "0", "1", "2")]
            names += [f"{base}.block.{blk.i_dw}.{m}" for m in ("", "0", "1", "2")]
            if blk.use_se:
                se = f"{base}.block.{blk.i_se}"
                names += [se, f"{se}.avgpool", f"{se}.fc1", f"{se}.activation",
                          f"{se}.fc2", f"{se}.scale_activation"]
            names += [f"{base}.block.{blk.i_proj}.{m}" for m in ("", "0", "1")]
        last = len(self.blocks) + 1
        names += [f"features.{last}", f"features.{last}.0", f"features.{last}.1", f"features.{last}.2"]
        names.append("avgpool")
        if self.num_classes:
            names += ["classifier", "classifier.0", "classifier.1", "classifier.2", "classifier.3"]
        return [n.rstrip(".") for n in names]

    def _param_specs(self):
        specs = [("features.0.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += _bn_specs("features.0.1", self.stem_ch)
        for bi, blk in enumerate(self.blocks, start=1):
            base = f"features.{bi}.block"
            if blk.has_expand:
                specs.append((f"{base}.0.0.weight", (1, 1, blk.c_in, blk.c_mid), "conv"))
                specs += _bn_specs(f"{base}.0.1", blk.c_mid)
            k = blk.kernel
            specs.append((f"{base}.{blk.i_dw}.0.weight", (k, k, 1, blk.c_mid), "dwconv"))
            specs += _bn_specs(f"{base}.{blk.i_dw}.1", blk.c_mid)
            if blk.use_se:
                specs += [
                    (f"{base}.{blk.i_se}.fc1.weight", (blk.c_mid, blk.c_se), "se_fc"),
                    (f"{base}.{blk.i_se}.fc1.bias", (blk.c_se,), "zeros"),
                    (f"{base}.{blk.i_se}.fc2.weight", (blk.c_se, blk.c_mid), "se_fc"),
                    (f"{base}.{blk.i_se}.fc2.bias", (blk.c_mid,), "zeros"),
                ]
            specs.append((f"{base}.{blk.i_proj}.0.weight", (1, 1, blk.c_mid, blk.c_out), "conv"))
            specs += _bn_specs(f"{base}.{blk.i_proj}.1", blk.c_out)
        last = len(self.blocks) + 1
        specs.append((f"features.{last}.0.weight", (1, 1, self.blocks[-1].c_out, self.head_ch), "conv"))
        specs += _bn_specs(f"features.{last}.1", self.head_ch)
        if self.num_classes:
            specs += [
                ("classifier.0.weight", (self.head_ch, self.hidden_ch), "fc"),
                ("classifier.0.bias", (self.hidden_ch,), "zeros"),
                ("classifier.3.weight", (self.hidden_ch, self.num_classes), "fc"),
                ("classifier.3.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def _squeeze_excite(self, params, x, prefix, tap):
        # The squeeze branch computes a gate; under LRP the gate is a
        # constant (gate_scale → CP-LRP), so this branch carries no
        # relevance and its ops stay raw. V3: ReLU squeeze, Hardsigmoid gate.
        pooled = tap(f"{prefix}.avgpool", global_avg_pool(x))
        s = pooled.reshape(pooled.shape[0], -1)
        s = tap(f"{prefix}.fc1", linear(s, params[f"{prefix}.fc1.weight"], params[f"{prefix}.fc1.bias"]))
        s = tap(f"{prefix}.activation", jax.nn.relu(s))
        s = tap(f"{prefix}.fc2", linear(s, params[f"{prefix}.fc2.weight"], params[f"{prefix}.fc2.bias"]))
        s = tap(f"{prefix}.scale_activation", jax.nn.hard_sigmoid(s))
        return tap(prefix, gate_scale(x, s[:, None, None, :]))

    def _bneck(self, params, x, base, blk: _V3Block, tap):
        act = hardswish if blk.act == "HS" else jax.nn.relu
        h = x
        if blk.has_expand:
            h = self._cna(params, h, f"{base}.block.0", tap, act=act)
        h = self._cna(params, h, f"{base}.block.{blk.i_dw}", tap,
                      stride=blk.stride, kernel=blk.kernel, groups=blk.c_mid, act=act)
        if blk.use_se:
            h = self._squeeze_excite(params, h, f"{base}.block.{blk.i_se}", tap)
        h = self._cna(params, h, f"{base}.block.{blk.i_proj}", tap, act=None)
        h = tap(f"{base}.block", h)
        if blk.residual:
            h = residual_add(x, h)  # LRP: proportional split, not a bare +
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = self._cna(params, x, "features.0", tap, stride=2, kernel=3, act=hardswish)
        for bi, blk in enumerate(self.blocks, start=1):
            x = self._bneck(params, x, f"features.{bi}", blk, tap)
        last = len(self.blocks) + 1
        x = self._cna(params, x, f"features.{last}", tap, stride=1, kernel=1, act=hardswish)
        x = tap("features", x)
        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        if self.num_classes:
            x = tap("classifier.0", linear(x, params["classifier.0.weight"], params["classifier.0.bias"]))
            x = tap("classifier.1", hardswish(x))
            x = tap("classifier.2", x)  # dropout: identity at inference
            logits = linear(x, params["classifier.3.weight"], params["classifier.3.bias"])
            logits = tap("classifier.3", logits)
            return tap("classifier", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        w = f", width_mult={self.width_mult}" if self.width_mult != 1.0 else ""
        return f"MobileNetV3(variant={self.variant!r}, num_classes={self.num_classes}{w})"
