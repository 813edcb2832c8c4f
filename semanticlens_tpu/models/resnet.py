"""Functional torchvision-compatible ResNets with named activation taps.

Subject-model family for the Collect stage (benchmark configs 1, 2, 4 in
BASELINE.md). The architecture, module names, and parameter names mirror
torchvision's ResNet so that (a) reference users' ``layer_names`` like
``"layer4.1.conv2"`` work verbatim and (b) pretrained torch checkpoints import
with a pure relayout (OIHW→HWIO convs, transposed fc).

Everything is functional: ``apply(params, x, tap_names)`` returns
``(logits, taps)`` with activations in NHWC. Inference-mode BN (running
stats); this is an analysis library, not a trainer.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import (
    residual_add,
    avg_pool,
    batch_norm,
    bn_param_specs,
    conv2d,
    global_avg_pool,
    linear,
    max_pool,
)

_STAGE_BLOCKS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}
_BOTTLENECK = {50, 101, 152}


def _conv_shape(out_ch, in_ch, k):
    return (k, k, in_ch, out_ch)  # HWIO


class ResNet(SubjectModel):
    """ResNet-18/34/50/101/152, channels-last, torch-compatible names.

    Parameters
    ----------
    depth : one of 18, 34, 50, 101, 152.
    num_classes : classifier width.
    dtype : activation dtype (bfloat16 by default — the MXU-native dtype).
    variant : "" for torchvision ResNet-v1.5, or "d" for the timm -D
        architecture (deep 3×3×3 stem with stem width 32, avg-pool
        downsampling) — e.g. ``resnet50d`` checkpoints, the reference
        quickstart's subject model. Parameter names follow timm
        (``conv1.0`` … ``conv1.6``, ``downsample.1``/``downsample.2``) so
        timm state dicts import by relayout.
    groups, width_per_group : torchvision's ResNeXt / Wide-ResNet knobs
        (bottleneck depths only). ``groups=32, width_per_group=4`` is
        ``resnext50_32x4d`` / ``resnext101_32x8d`` (with 8);
        ``width_per_group=128`` is ``wide_resnet50_2`` / ``wide_resnet101_2``.
        Bottleneck inner width follows torchvision:
        ``int(planes * width_per_group / 64) * groups``.
    quantize : ``None`` (default) or ``"int8"``. Int8 puts every STAGE
        convolution (``layerS.B.convN`` + downsample projections) on the
        v5e MXU's 2×-rate int8 path — static per-out-channel int8 weights ×
        dynamic per-sample int8 activations (ops/quant.py). The stem conv
        (raw-pixel statistics), BNs, and the fc head stay float, standard
        int8-CNN practice. OPT-IN ONLY: quantization perturbs tapped
        activations within rounding noise, so top-k concept-example picks
        can reorder near ties; the default Collect tower stays bf16 for
        reference parity. Attribution/LRP dequantizes (never sees rounding).
    """

    STEM_WIDTH_D = 32  # timm resnet*d default

    def __init__(
        self,
        depth: int = 18,
        num_classes: int = 1000,
        dtype=jnp.bfloat16,
        variant: str = "",
        groups: int = 1,
        width_per_group: int = 64,
        quantize: str | None = None,
    ):
        if depth not in _STAGE_BLOCKS:
            raise ValueError(f"Unsupported ResNet depth {depth}")
        if variant not in ("", "d"):
            raise ValueError(f"Unsupported ResNet variant {variant!r}; expected '' or 'd'")
        if quantize not in (None, "int8"):
            raise ValueError(f"Unsupported quantize mode {quantize!r}; expected None or 'int8'")
        self.quantize = quantize
        self.depth = depth
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        self.bottleneck = depth in _BOTTLENECK
        if (groups != 1 or width_per_group != 64) and not self.bottleneck:
            raise ValueError(
                "groups/width_per_group configure bottleneck ResNets only "
                "(torchvision raises the same constraint)"
            )
        self.groups = groups
        self.width_per_group = width_per_group
        self.expansion = 4 if self.bottleneck else 1
        self.stage_blocks = _STAGE_BLOCKS[depth]
        self.module_names = tuple(self._enumerate_module_names())

    def _inner_width(self, stage: int) -> int:
        """Bottleneck conv2 width — torchvision's Bottleneck.__init__ formula."""
        planes = 64 * (2 ** (stage - 1))
        return int(planes * self.width_per_group / 64) * self.groups

    # ------------------------------------------------------------------ names
    def _block_module_names(self, prefix: str, has_downsample: bool):
        names = [prefix]
        convs = ("conv1", "bn1", "conv2", "bn2", "conv3", "bn3") if self.bottleneck else (
            "conv1",
            "bn1",
            "conv2",
            "bn2",
        )
        names += [f"{prefix}.{n}" for n in convs]
        names.append(f"{prefix}.relu")
        if has_downsample:
            names.append(f"{prefix}.downsample")
            if self.variant == "d":
                names += [f"{prefix}.downsample.{i}" for i in (0, 1, 2)]
            else:
                names += [f"{prefix}.downsample.0", f"{prefix}.downsample.1"]
        return names

    def _enumerate_module_names(self):
        if self.variant == "d":
            names = ["conv1"] + [f"conv1.{i}" for i in range(7)] + ["bn1", "relu", "maxpool"]
        else:
            names = ["conv1", "bn1", "relu", "maxpool"]
        in_ch = 64
        for stage, n_blocks in enumerate(self.stage_blocks, start=1):
            out_ch = 64 * (2 ** (stage - 1)) * self.expansion
            names.append(f"layer{stage}")
            for b in range(n_blocks):
                has_ds = b == 0 and (stage > 1 or in_ch != out_ch)
                names += self._block_module_names(f"layer{stage}.{b}", has_ds)
            in_ch = out_ch
        names += ["avgpool", "fc"]
        return names

    # ------------------------------------------------------------------ init
    def _param_specs(self):
        """Yield (name, shape, kind) for every parameter tensor."""
        if self.variant == "d":
            sw = self.STEM_WIDTH_D
            specs = [("conv1.0.weight", _conv_shape(sw, 3, 3), "conv")]
            specs += self._bn_specs("conv1.1", sw)
            specs += [("conv1.3.weight", _conv_shape(sw, sw, 3), "conv")]
            specs += self._bn_specs("conv1.4", sw)
            specs += [("conv1.6.weight", _conv_shape(64, sw, 3), "conv")]
            specs += self._bn_specs("bn1", 64)
        else:
            specs = [("conv1.weight", _conv_shape(64, 3, 7), "conv")]
            specs += self._bn_specs("bn1", 64)
        in_ch = 64
        for stage, n_blocks in enumerate(self.stage_blocks, start=1):
            width = self._inner_width(stage) if self.bottleneck else 64 * (2 ** (stage - 1))
            out_ch = 64 * (2 ** (stage - 1)) * self.expansion
            for b in range(n_blocks):
                prefix = f"layer{stage}.{b}"
                if self.bottleneck:
                    specs += [(f"{prefix}.conv1.weight", _conv_shape(width, in_ch, 1), "conv")]
                    specs += self._bn_specs(f"{prefix}.bn1", width)
                    specs += [
                        (f"{prefix}.conv2.weight", _conv_shape(width, width // self.groups, 3), "conv")
                    ]
                    specs += self._bn_specs(f"{prefix}.bn2", width)
                    specs += [(f"{prefix}.conv3.weight", _conv_shape(out_ch, width, 1), "conv")]
                    specs += self._bn_specs(f"{prefix}.bn3", out_ch)
                else:
                    specs += [(f"{prefix}.conv1.weight", _conv_shape(width, in_ch, 3), "conv")]
                    specs += self._bn_specs(f"{prefix}.bn1", width)
                    specs += [(f"{prefix}.conv2.weight", _conv_shape(width, width, 3), "conv")]
                    specs += self._bn_specs(f"{prefix}.bn2", width)
                if b == 0 and (stage > 1 or in_ch != out_ch):
                    if self.variant == "d":  # [avgpool, conv, bn] → conv at .1
                        specs += [
                            (f"{prefix}.downsample.1.weight", _conv_shape(out_ch, in_ch, 1), "conv")
                        ]
                        specs += self._bn_specs(f"{prefix}.downsample.2", out_ch)
                    else:
                        specs += [
                            (f"{prefix}.downsample.0.weight", _conv_shape(out_ch, in_ch, 1), "conv")
                        ]
                        specs += self._bn_specs(f"{prefix}.downsample.1", out_ch)
                in_ch = out_ch
        specs += [
            ("fc.weight", (512 * self.expansion, self.num_classes), "linear"),
            ("fc.bias", (self.num_classes,), "bias"),
        ]
        return specs

    @staticmethod
    def _bn_specs(prefix, ch):
        return bn_param_specs(prefix, ch, ones_kind="bn_scale", zeros_kind="bias")

    def init(self, rng) -> dict[str, jax.Array]:
        """Kaiming-normal convs (fan_out, torchvision default), unit BN."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "conv":
                fan_out = shape[0] * shape[1] * shape[3]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "linear":
                bound = 1.0 / math.sqrt(shape[0])
                params[name] = jax.random.uniform(sub, shape, jnp.float32, -bound, bound)
            elif kind == "bn_scale":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return self._maybe_quantize(params)

    def _maybe_quantize(self, params: dict) -> dict:
        """Int8-quantize the stage convolutions when ``quantize='int8'``.

        Eligibility comes from the model's own param specs (kind == 'conv'),
        never a name regex — ``downsample.1`` is a conv in one variant and a
        BN in the other. Stem convs (no ``layer`` prefix) stay float."""
        if self.quantize != "int8":
            return params
        from semanticlens_tpu.ops.quant import quantize_params

        conv_keys = {
            name
            for name, _, kind in self._param_specs()
            if kind == "conv" and name.startswith("layer")
        }
        return quantize_params(params, conv_keys.__contains__)

    # ------------------------------------------------------------------ apply
    def _bn(self, params, prefix, x):
        return batch_norm(
            x,
            params[f"{prefix}.weight"],
            params[f"{prefix}.bias"],
            params[f"{prefix}.running_mean"],
            params[f"{prefix}.running_var"],
        )

    def _has_downsample(self, params, prefix):
        key = ".downsample.1.weight" if self.variant == "d" else ".downsample.0.weight"
        return f"{prefix}{key}" in params

    def _downsample_path(self, params, prefix, x, stride, tap):
        """Shortcut projection: strided 1×1 conv (v1.5) or avgpool + 1×1 (-D)."""
        if self.variant == "d":
            h = avg_pool(x, window=stride, stride=stride) if stride > 1 else x
            h = tap(f"{prefix}.downsample.0", h)
            h = tap(f"{prefix}.downsample.1", conv2d(h, params[f"{prefix}.downsample.1.weight"]))
            h = tap(f"{prefix}.downsample.2", self._bn(params, f"{prefix}.downsample.2", h))
        else:
            h = tap(
                f"{prefix}.downsample.0",
                conv2d(x, params[f"{prefix}.downsample.0.weight"], stride=stride),
            )
            h = tap(f"{prefix}.downsample.1", self._bn(params, f"{prefix}.downsample.1", h))
        h = tap(f"{prefix}.downsample", h)
        return h

    def _basic_block(self, params, prefix, x, stride, tap):
        identity = x
        out = tap(f"{prefix}.conv1", conv2d(x, params[f"{prefix}.conv1.weight"], stride=stride, padding=1))
        out = tap(f"{prefix}.bn1", self._bn(params, f"{prefix}.bn1", out))
        out = jax.nn.relu(out)
        out = tap(f"{prefix}.conv2", conv2d(out, params[f"{prefix}.conv2.weight"], padding=1))
        out = tap(f"{prefix}.bn2", self._bn(params, f"{prefix}.bn2", out))
        if self._has_downsample(params, prefix):
            identity = self._downsample_path(params, prefix, x, stride, tap)
        out = jax.nn.relu(residual_add(out, identity))
        out = tap(f"{prefix}.relu", out)
        return tap(prefix, out)

    def _bottleneck_block(self, params, prefix, x, stride, tap):
        identity = x
        out = tap(f"{prefix}.conv1", conv2d(x, params[f"{prefix}.conv1.weight"]))
        out = jax.nn.relu(tap(f"{prefix}.bn1", self._bn(params, f"{prefix}.bn1", out)))
        out = tap(
            f"{prefix}.conv2",
            conv2d(out, params[f"{prefix}.conv2.weight"], stride=stride, padding=1, groups=self.groups),
        )
        out = jax.nn.relu(tap(f"{prefix}.bn2", self._bn(params, f"{prefix}.bn2", out)))
        out = tap(f"{prefix}.conv3", conv2d(out, params[f"{prefix}.conv3.weight"]))
        out = tap(f"{prefix}.bn3", self._bn(params, f"{prefix}.bn3", out))
        if self._has_downsample(params, prefix):
            identity = self._downsample_path(params, prefix, x, stride, tap)
        out = jax.nn.relu(residual_add(out, identity))
        out = tap(f"{prefix}.relu", out)
        return tap(prefix, out)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """Forward pass. x: (B, H, W, 3) float. Returns (logits, taps)."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)

        if self.variant == "d":
            x = tap("conv1.0", conv2d(x, params["conv1.0.weight"], stride=2, padding=1))
            x = jax.nn.relu(tap("conv1.1", self._bn(params, "conv1.1", x)))
            x = tap("conv1.3", conv2d(x, params["conv1.3.weight"], padding=1))
            x = jax.nn.relu(tap("conv1.4", self._bn(params, "conv1.4", x)))
            x = tap("conv1", tap("conv1.6", conv2d(x, params["conv1.6.weight"], padding=1)))
        else:
            x = tap("conv1", conv2d(x, params["conv1.weight"], stride=2, padding=3))
        x = tap("bn1", self._bn(params, "bn1", x))
        x = tap("relu", jax.nn.relu(x))
        x = tap("maxpool", max_pool(x, window=3, stride=2, padding=1))

        block_fn = self._bottleneck_block if self.bottleneck else self._basic_block
        for stage, n_blocks in enumerate(self.stage_blocks, start=1):
            for b in range(n_blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = block_fn(params, f"layer{stage}.{b}", x, stride, tap)
            x = tap(f"layer{stage}", x)

        x = tap("avgpool", global_avg_pool(x))
        x = x.reshape(x.shape[0], -1)
        logits = tap("fc", linear(x, params["fc.weight"], params["fc.bias"]))
        return logits, tap.taps

    # ------------------------------------------------------------- torch load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision ResNet state dict to this layout.

        Accepts tensors or numpy arrays; relayouts convs OIHW→HWIO and
        transposes ``fc.weight`` to (in, out).
        """
        params = {}
        for name, _, _ in self._param_specs():
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
            elif name == "fc.weight":
                arr = arr.T
            params[name] = jnp.asarray(arr, jnp.float32)
        return self._maybe_quantize(params)

    def __repr__(self):
        v = f", variant='{self.variant}'" if self.variant else ""
        if self.groups != 1 or self.width_per_group != 64:
            v += f", groups={self.groups}, width_per_group={self.width_per_group}"
        if self.quantize:
            # cache keys derive from repr via get_fallback_name — a quantized
            # tower must never share ActMax/concept-DB caches with the float one
            v += f", quantize='{self.quantize}'"
        return f"ResNet(depth={self.depth}, num_classes={self.num_classes}{v})"
