"""Functional torchvision-compatible EfficientNet (B0–B7) with named taps.

EfficientNet is the canonical compound-scaled MBConv subject. Module and
parameter names mirror ``torchvision.models.efficientnet_b*`` exactly
(``features.{stage}.{block}.block.{idx}...``, SE as ``fc1``/``fc2``), so a
reference user's ``layer_names=["features.6"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference capability:
any torch model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- channel widths go through torchvision's ``_make_divisible(v, 8)`` and block
  counts through ``ceil(layers * depth_mult)`` — the compound-scaling
  arithmetic is reproduced exactly (B2's 1408-d head, B4's 1792-d, …);
- SE squeeze width is ``max(1, block_input_channels // 4)`` computed from the
  block config's (pre-expansion) input channels, including the
  input=output rewrite for non-first blocks in a stage;
- BatchNorm eps is 1e-5 for B0–B4 and 1e-3 for B5–B7 (torchvision passes
  ``partial(BatchNorm2d, eps=0.001)`` only for the three largest variants);
- stochastic depth and dropout are train-time-only — inference is identity,
  but ``stochastic_depth`` / ``classifier.0`` stay hookable names.

TPU mapping: the expand/project 1×1 convs are MXU matmuls; the k×k depthwise
runs on the VPU (``feature_group_count=C`` — same codegen class as
ConvNeXt/MobileCLIP, see docs/PERF_NOTES.md "Subject-model zoo"), and the SE
block reduces to two tiny vector matmuls on the pooled (B, C) tensor.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import (
    batch_norm,
    bn_param_specs,
    conv2d,
    gate_scale,
    global_avg_pool,
    linear,
    load_torch_params,
    residual_add,
    silu,
)

# Base (B0) stage settings: (expand_ratio, kernel, stride, in_ch, out_ch, layers)
_B0_STAGES = (
    (1, 3, 1, 32, 16, 1),
    (6, 3, 2, 16, 24, 2),
    (6, 5, 2, 24, 40, 2),
    (6, 3, 2, 40, 80, 3),
    (6, 5, 1, 80, 112, 3),
    (6, 5, 2, 112, 192, 4),
    (6, 3, 1, 192, 320, 1),
)

# variant -> (width_mult, depth_mult, bn_eps). Resolutions (224…600) are the
# training-time choice; inference accepts any stride-compatible size.
_VARIANTS = {
    "b0": (1.0, 1.0, 1e-5),
    "b1": (1.0, 1.1, 1e-5),
    "b2": (1.1, 1.2, 1e-5),
    "b3": (1.2, 1.4, 1e-5),
    "b4": (1.4, 1.8, 1e-5),
    "b5": (1.6, 2.2, 1e-3),
    "b6": (1.8, 2.6, 1e-3),
    "b7": (2.0, 3.1, 1e-3),
}


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision.models._utils._make_divisible (round-to-nearest-8 with the
    ≥ 0.9·v guard)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _BlockCfg:
    """One MBConv instance after compound scaling (torchvision MBConvConfig)."""

    def __init__(self, expand, kernel, stride, c_in, c_out):
        self.expand = expand
        self.kernel = kernel
        self.stride = stride
        self.c_in = c_in
        self.c_out = c_out
        self.c_mid = _make_divisible(c_in * expand)
        self.c_se = max(1, c_in // 4)
        self.has_expand = self.c_mid != c_in
        # block.{idx} positions inside the torchvision MBConv Sequential
        self.i_dw = 1 if self.has_expand else 0
        self.i_se = self.i_dw + 1
        self.i_proj = self.i_se + 1
        self.residual = stride == 1 and c_in == c_out


class EfficientNet(SubjectModel):
    """EfficientNet-B0…B7, channels-last, torchvision-compatible names.

    Parameters
    ----------
    variant : "b0" … "b7".
    num_classes : classifier width (0 → headless pooled features).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    def __init__(self, variant: str = "b0", num_classes: int = 1000, *, dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        width, depth, self.bn_eps = _VARIANTS[variant]

        adjust = lambda c: _make_divisible(c * width)  # noqa: E731
        self.stem_ch = adjust(32)
        self.stages: list[list[_BlockCfg]] = []
        for expand, kernel, stride, c_in, c_out, layers in _B0_STAGES:
            c_in, c_out = adjust(c_in), adjust(c_out)
            blocks = []
            for j in range(int(math.ceil(layers * depth))):
                blocks.append(
                    _BlockCfg(expand, kernel, stride if j == 0 else 1, c_in if j == 0 else c_out, c_out)
                )
            self.stages.append(blocks)
        self.head_ch = 4 * self.stages[-1][-1].c_out
        self.num_features = self.head_ch
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["features", "features.0", "features.0.0", "features.0.1", "features.0.2"]
        for si, blocks in enumerate(self.stages, start=1):
            names.append(f"features.{si}")
            for bi, cfg in enumerate(blocks):
                base = f"features.{si}.{bi}"
                names += [base, f"{base}.block"]
                for idx in ([0] if cfg.has_expand else []):
                    names += [f"{base}.block.{idx}.{m}" for m in ("", "0", "1", "2")]
                names += [f"{base}.block.{cfg.i_dw}.{m}" for m in ("", "0", "1", "2")]
                se = f"{base}.block.{cfg.i_se}"
                names += [se, f"{se}.avgpool", f"{se}.fc1", f"{se}.activation",
                          f"{se}.fc2", f"{se}.scale_activation"]
                names += [f"{base}.block.{cfg.i_proj}.{m}" for m in ("", "0", "1")]
                names.append(f"{base}.stochastic_depth")
        last = len(self.stages) + 1
        names += [f"features.{last}", f"features.{last}.0", f"features.{last}.1", f"features.{last}.2"]
        names.append("avgpool")
        if self.num_classes:
            names += ["classifier", "classifier.0", "classifier.1"]
        return [n.rstrip(".") for n in names]

    # ------------------------------------------------------------------ specs
    def _bn_specs(self, prefix: str, ch: int):
        return bn_param_specs(prefix, ch)

    def _param_specs(self):
        specs = [("features.0.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += self._bn_specs("features.0.1", self.stem_ch)
        for si, blocks in enumerate(self.stages, start=1):
            for bi, cfg in enumerate(blocks):
                base = f"features.{si}.{bi}.block"
                if cfg.has_expand:
                    specs.append((f"{base}.0.0.weight", (1, 1, cfg.c_in, cfg.c_mid), "conv"))
                    specs += self._bn_specs(f"{base}.0.1", cfg.c_mid)
                k = cfg.kernel
                specs.append((f"{base}.{cfg.i_dw}.0.weight", (k, k, 1, cfg.c_mid), "dwconv"))
                specs += self._bn_specs(f"{base}.{cfg.i_dw}.1", cfg.c_mid)
                specs += [
                    (f"{base}.{cfg.i_se}.fc1.weight", (cfg.c_mid, cfg.c_se), "se_fc"),
                    (f"{base}.{cfg.i_se}.fc1.bias", (cfg.c_se,), "zeros"),
                    (f"{base}.{cfg.i_se}.fc2.weight", (cfg.c_se, cfg.c_mid), "se_fc"),
                    (f"{base}.{cfg.i_se}.fc2.bias", (cfg.c_mid,), "zeros"),
                ]
                specs.append((f"{base}.{cfg.i_proj}.0.weight", (1, 1, cfg.c_mid, cfg.c_out), "conv"))
                specs += self._bn_specs(f"{base}.{cfg.i_proj}.1", cfg.c_out)
        last = len(self.stages) + 1
        c_last_in = self.stages[-1][-1].c_out
        specs.append((f"features.{last}.0.weight", (1, 1, c_last_in, self.head_ch), "conv"))
        specs += self._bn_specs(f"features.{last}.1", self.head_ch)
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (self.head_ch, self.num_classes), "fc"),
                ("classifier.1.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme: kaiming-normal fan-out for every Conv2d
        (incl. the SE 1×1 convs, where fan-out = out-channels), unit BN,
        and uniform ±1/√out_features for the classifier Linear."""
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
                bound = 1.0 / math.sqrt(shape[1])  # torchvision: 1/√out_features
                params[name] = jax.random.uniform(sub, shape, jnp.float32, -bound, bound)
            elif kind == "bn_w":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    # ------------------------------------------------------------------ apply
    def _conv_bn_act(self, params, x, prefix, tap, *, stride=1, kernel=1, groups=1, act=True):
        """One torchvision Conv2dNormActivation: conv → BN → (SiLU)."""
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
        if act:
            x = tap(f"{prefix}.2", silu(x))  # LRP pass-through rule
        return tap(prefix, x)

    def _squeeze_excite(self, params, x, prefix, tap):
        # The squeeze branch computes a gate; under LRP the gate is a
        # constant (gate_scale → CP-LRP), so this branch carries no
        # relevance and its ops stay raw.
        pooled = tap(f"{prefix}.avgpool", global_avg_pool(x))
        s = pooled.reshape(pooled.shape[0], -1)
        s = tap(f"{prefix}.fc1", linear(s, params[f"{prefix}.fc1.weight"], params[f"{prefix}.fc1.bias"]))
        s = tap(f"{prefix}.activation", jax.nn.silu(s))
        s = tap(f"{prefix}.fc2", linear(s, params[f"{prefix}.fc2.weight"], params[f"{prefix}.fc2.bias"]))
        s = tap(f"{prefix}.scale_activation", jax.nn.sigmoid(s))
        return tap(prefix, gate_scale(x, s[:, None, None, :]))

    def _mbconv(self, params, x, base, cfg: _BlockCfg, tap):
        h = x
        if cfg.has_expand:
            h = self._conv_bn_act(params, h, f"{base}.block.0", tap)
        h = self._conv_bn_act(params, h, f"{base}.block.{cfg.i_dw}", tap,
                              stride=cfg.stride, kernel=cfg.kernel, groups=cfg.c_mid)
        h = self._squeeze_excite(params, h, f"{base}.block.{cfg.i_se}", tap)
        h = self._conv_bn_act(params, h, f"{base}.block.{cfg.i_proj}", tap, act=False)
        h = tap(f"{base}.block", h)
        # stochastic depth: identity at inference (train-time regularizer)
        h = tap(f"{base}.stochastic_depth", h)
        if cfg.residual:
            h = residual_add(x, h)  # LRP: proportional split, not a bare +
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)

        x = self._conv_bn_act(params, x, "features.0", tap, stride=2, kernel=3)
        for si, blocks in enumerate(self.stages, start=1):
            for bi, cfg in enumerate(blocks):
                x = self._mbconv(params, x, f"features.{si}.{bi}", cfg, tap)
            x = tap(f"features.{si}", x)
        last = len(self.stages) + 1
        x = self._conv_bn_act(params, x, f"features.{last}", tap, stride=1, kernel=1)
        x = tap("features", x)

        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        x = tap("classifier.0", x)  # dropout: identity at inference
        if self.num_classes:
            logits = linear(x, params["classifier.1.weight"], params["classifier.1.bias"])
            logits = tap("classifier.1", logits)
            return tap("classifier", logits), tap.taps
        return x, tap.taps

    # ------------------------------------------------------------- torch load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision EfficientNet state dict: convs OIHW→HWIO
        (depthwise (C,1,k,k)→(k,k,1,C) via the same transpose), SE 1×1 convs
        squeezed to (in, out) linears, classifier transposed."""
        return load_torch_params(self._param_specs(), state_dict)

    def __repr__(self):
        return f"EfficientNet(variant={self.variant!r}, num_classes={self.num_classes})"


# EfficientNetV2 stage rows: (fused, expand, kernel, stride, c_in, c_out, layers)
_V2_CONFS = {
    "v2_s": (24, (
        (True, 1, 3, 1, 24, 24, 2),
        (True, 4, 3, 2, 24, 48, 4),
        (True, 4, 3, 2, 48, 64, 4),
        (False, 4, 3, 2, 64, 128, 6),
        (False, 6, 3, 1, 128, 160, 9),
        (False, 6, 3, 2, 160, 256, 15),
    )),
    "v2_m": (24, (
        (True, 1, 3, 1, 24, 24, 3),
        (True, 4, 3, 2, 24, 48, 5),
        (True, 4, 3, 2, 48, 80, 5),
        (False, 4, 3, 2, 80, 160, 7),
        (False, 6, 3, 1, 160, 176, 14),
        (False, 6, 3, 2, 176, 304, 18),
        (False, 6, 3, 1, 304, 512, 5),
    )),
    "v2_l": (32, (
        (True, 1, 3, 1, 32, 32, 4),
        (True, 4, 3, 2, 32, 64, 7),
        (True, 4, 3, 2, 64, 96, 7),
        (False, 4, 3, 2, 96, 192, 10),
        (False, 6, 3, 1, 192, 224, 19),
        (False, 6, 3, 2, 224, 384, 25),
        (False, 6, 3, 1, 384, 640, 7),
    )),
}


class _FusedBlockCfg:
    """One FusedMBConv instance (torchvision FusedMBConvConfig): the 3×3
    does the expansion in one dense conv; no SE, no depthwise."""

    fused = True

    def __init__(self, expand, kernel, stride, c_in, c_out):
        self.expand = expand
        self.kernel = kernel
        self.stride = stride
        self.c_in = c_in
        self.c_out = c_out
        self.c_mid = _make_divisible(c_in * expand)
        self.has_expand = self.c_mid != c_in
        self.residual = stride == 1 and c_in == c_out


class EfficientNetV2(EfficientNet):
    """EfficientNetV2-S/M/L, channels-last, torchvision-compatible names.

    Mixed fused-MBConv (early stages — one dense k×k expansion conv, no SE)
    and MBConv (late stages, identical to V1) trunk with explicit per-stage
    channel tables (no compound scaling), BN eps 1e-3, fixed 1280-d head —
    all per torchvision's ``efficientnet_v2_{s,m,l}`` configuration.
    Everything else (taps, LRP rules, checkpoint relayout, engine
    integration) is inherited from :class:`EfficientNet`.

    TPU note: the fused early stages are MXU-dense convolutions (no VPU
    depthwise), which is exactly the V2 paper's training-speed argument —
    it applies verbatim to this framework's sweep throughput.
    """

    def __init__(self, variant: str = "v2_s", num_classes: int = 1000, *, dtype=jnp.bfloat16):
        if variant not in _V2_CONFS:
            raise ValueError(f"variant must be one of {sorted(_V2_CONFS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        self.bn_eps = 1e-3
        stem, rows = _V2_CONFS[variant]
        self.stem_ch = stem
        self.stages = []
        for fused, expand, kernel, stride, c_in, c_out, layers in rows:
            blocks = []
            for j in range(layers):
                cin_j = c_in if j == 0 else c_out
                s_j = stride if j == 0 else 1
                if fused:
                    blocks.append(_FusedBlockCfg(expand, kernel, s_j, cin_j, c_out))
                else:
                    blocks.append(_BlockCfg(expand, kernel, s_j, cin_j, c_out))
            self.stages.append(blocks)
        self.head_ch = 1280  # torchvision: last_channel fixed for V2
        self.num_features = self.head_ch
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["features", "features.0", "features.0.0", "features.0.1", "features.0.2"]
        for si, blocks in enumerate(self.stages, start=1):
            names.append(f"features.{si}")
            for bi, cfg in enumerate(blocks):
                base = f"features.{si}.{bi}"
                names += [base, f"{base}.block"]
                if getattr(cfg, "fused", False):
                    if cfg.has_expand:
                        names += [f"{base}.block.0.{m}" for m in ("", "0", "1", "2")]
                        names += [f"{base}.block.1.{m}" for m in ("", "0", "1")]
                    else:
                        names += [f"{base}.block.0.{m}" for m in ("", "0", "1", "2")]
                else:
                    for idx in ([0] if cfg.has_expand else []):
                        names += [f"{base}.block.{idx}.{m}" for m in ("", "0", "1", "2")]
                    names += [f"{base}.block.{cfg.i_dw}.{m}" for m in ("", "0", "1", "2")]
                    se = f"{base}.block.{cfg.i_se}"
                    names += [se, f"{se}.avgpool", f"{se}.fc1", f"{se}.activation",
                              f"{se}.fc2", f"{se}.scale_activation"]
                    names += [f"{base}.block.{cfg.i_proj}.{m}" for m in ("", "0", "1")]
                names.append(f"{base}.stochastic_depth")
        last = len(self.stages) + 1
        names += [f"features.{last}", f"features.{last}.0", f"features.{last}.1", f"features.{last}.2"]
        names.append("avgpool")
        if self.num_classes:
            names += ["classifier", "classifier.0", "classifier.1"]
        return [n.rstrip(".") for n in names]

    # ------------------------------------------------------------------ specs
    def _param_specs(self):
        specs = [("features.0.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += self._bn_specs("features.0.1", self.stem_ch)
        for si, blocks in enumerate(self.stages, start=1):
            for bi, cfg in enumerate(blocks):
                base = f"features.{si}.{bi}.block"
                k = cfg.kernel
                if getattr(cfg, "fused", False):
                    if cfg.has_expand:
                        specs.append((f"{base}.0.0.weight", (k, k, cfg.c_in, cfg.c_mid), "conv"))
                        specs += self._bn_specs(f"{base}.0.1", cfg.c_mid)
                        specs.append((f"{base}.1.0.weight", (1, 1, cfg.c_mid, cfg.c_out), "conv"))
                        specs += self._bn_specs(f"{base}.1.1", cfg.c_out)
                    else:
                        specs.append((f"{base}.0.0.weight", (k, k, cfg.c_in, cfg.c_out), "conv"))
                        specs += self._bn_specs(f"{base}.0.1", cfg.c_out)
                    continue
                if cfg.has_expand:
                    specs.append((f"{base}.0.0.weight", (1, 1, cfg.c_in, cfg.c_mid), "conv"))
                    specs += self._bn_specs(f"{base}.0.1", cfg.c_mid)
                specs.append((f"{base}.{cfg.i_dw}.0.weight", (k, k, 1, cfg.c_mid), "dwconv"))
                specs += self._bn_specs(f"{base}.{cfg.i_dw}.1", cfg.c_mid)
                specs += [
                    (f"{base}.{cfg.i_se}.fc1.weight", (cfg.c_mid, cfg.c_se), "se_fc"),
                    (f"{base}.{cfg.i_se}.fc1.bias", (cfg.c_se,), "zeros"),
                    (f"{base}.{cfg.i_se}.fc2.weight", (cfg.c_se, cfg.c_mid), "se_fc"),
                    (f"{base}.{cfg.i_se}.fc2.bias", (cfg.c_mid,), "zeros"),
                ]
                specs.append((f"{base}.{cfg.i_proj}.0.weight", (1, 1, cfg.c_mid, cfg.c_out), "conv"))
                specs += self._bn_specs(f"{base}.{cfg.i_proj}.1", cfg.c_out)
        last = len(self.stages) + 1
        c_last_in = self.stages[-1][-1].c_out
        specs.append((f"features.{last}.0.weight", (1, 1, c_last_in, self.head_ch), "conv"))
        specs += self._bn_specs(f"features.{last}.1", self.head_ch)
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (self.head_ch, self.num_classes), "fc"),
                ("classifier.1.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    # ------------------------------------------------------------------ apply
    def _fused_mbconv(self, params, x, base, cfg: _FusedBlockCfg, tap):
        if cfg.has_expand:
            h = self._conv_bn_act(params, x, f"{base}.block.0", tap,
                                  stride=cfg.stride, kernel=cfg.kernel)
            h = self._conv_bn_act(params, h, f"{base}.block.1", tap, act=False)
        else:
            h = self._conv_bn_act(params, x, f"{base}.block.0", tap,
                                  stride=cfg.stride, kernel=cfg.kernel)
        h = tap(f"{base}.block", h)
        h = tap(f"{base}.stochastic_depth", h)  # identity at inference
        if cfg.residual:
            h = residual_add(x, h)  # LRP: proportional split
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = self._conv_bn_act(params, x, "features.0", tap, stride=2, kernel=3)
        for si, blocks in enumerate(self.stages, start=1):
            for bi, cfg in enumerate(blocks):
                base = f"features.{si}.{bi}"
                if getattr(cfg, "fused", False):
                    x = self._fused_mbconv(params, x, base, cfg, tap)
                else:
                    x = self._mbconv(params, x, base, cfg, tap)
            x = tap(f"features.{si}", x)
        last = len(self.stages) + 1
        x = self._conv_bn_act(params, x, f"features.{last}", tap, stride=1, kernel=1)
        x = tap("features", x)
        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        x = tap("classifier.0", x)  # dropout: identity at inference
        if self.num_classes:
            logits = linear(x, params["classifier.1.weight"], params["classifier.1.bias"])
            logits = tap("classifier.1", logits)
            return tap("classifier", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        return f"EfficientNetV2(variant={self.variant!r}, num_classes={self.num_classes})"
