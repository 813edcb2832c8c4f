"""Functional torchvision-compatible ShuffleNetV2 with named taps.

ShuffleNetV2 (Ma et al., ECCV 2018) is the channel-split / channel-shuffle
efficiency family. Module and parameter names mirror
``torchvision.models.shufflenet_v2_x*`` exactly (``conv1.{0,1}``,
``stage{2,3,4}.{i}.branch{1,2}.{j}``, ``conv5``, ``fc``), so a reference
user's ``layer_names=["stage3"]`` works verbatim and pretrained torchvision
checkpoints import with a pure relayout (reference capability: any torch
model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- stride-1 units SPLIT the channels (first half bypasses, second half runs
  ``branch2``); stride-2 units run BOTH branches on the full input —
  ``branch1`` (depthwise 3×3/s2 → 1×1) exists only there. torchvision's
  stride-1 units do own an EMPTY ``branch1`` Sequential, but it is never
  called, so hooks on it never fire — it is correspondingly absent from
  ``module_names`` here (same policy as Swin's functional qkv/proj);
- every unit ends with ``channel_shuffle(·, groups=2)`` — a free
  reshape/transpose in XLA (the (…, 2, C/2) → (…, C/2, 2) swap);
- the trunk pools with ``x.mean([2, 3])`` — there is no ``avgpool`` module;
- all convs are bias-free; BN eps 1e-5.

TPU mapping: 1×1 convs are MXU matmuls, the 3×3 depthwise runs on the VPU
(same codegen class as MobileNet — docs/PERF_NOTES.md "Subject-model zoo"),
and the shuffle/split/concat are layout ops XLA fuses into neighbors.
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
    linear,
    load_torch_params,
    max_pool,
)

_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)

_REPEATS = (4, 8, 4)
# variant -> stage output channels (stem, stage2, stage3, stage4, conv5)
_VARIANTS = {
    "x0_5": (24, 48, 96, 192, 1024),
    "x1_0": (24, 116, 232, 464, 1024),
    "x1_5": (24, 176, 352, 704, 1024),
    "x2_0": (24, 244, 488, 976, 2048),
}


def channel_shuffle(x, groups: int = 2):
    """torchvision ``channel_shuffle`` in NHWC: channel c = g·(C/groups)+a
    moves to a·groups+g (the (groups, C/g) → (C/g, groups) transpose)."""
    b, h, w, c = x.shape
    return (
        x.reshape(b, h, w, groups, c // groups)
        .swapaxes(3, 4)
        .reshape(b, h, w, c)
    )


class _Unit:
    """One InvertedResidual instance."""

    def __init__(self, c_in, c_out, stride):
        self.c_in = c_in
        self.c_out = c_out
        self.stride = stride
        self.branch = c_out // 2
        self.downsample = stride > 1


class ShuffleNetV2(SubjectModel):
    """ShuffleNetV2 ×0.5/×1.0/×1.5/×2.0, channels-last, torch names.

    Parameters
    ----------
    variant : "x0_5" | "x1_0" | "x1_5" | "x2_0" (torchvision's
        ``shufflenet_v2_{variant}`` model set).
    num_classes : classifier width (0 → headless pooled features).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-5

    def __init__(self, variant: str = "x1_0", num_classes: int = 1000, *,
                 dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        chans = _VARIANTS[variant]
        self.stem_ch = chans[0]
        self.conv5_ch = chans[4]
        self.stages: list[list[_Unit]] = []
        c_in = self.stem_ch
        for reps, c_out in zip(_REPEATS, chans[1:4]):
            units = [_Unit(c_in, c_out, 2)]
            units += [_Unit(c_out, c_out, 1) for _ in range(reps - 1)]
            self.stages.append(units)
            c_in = c_out
        self.num_features = self.conv5_ch
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["conv1", "conv1.0", "conv1.1", "conv1.2", "maxpool"]
        for si, units in enumerate(self.stages, start=2):
            names.append(f"stage{si}")
            for ui, unit in enumerate(units):
                base = f"stage{si}.{ui}"
                names.append(base)
                if unit.downsample:
                    names += [f"{base}.branch1"] + [f"{base}.branch1.{j}" for j in range(5)]
                names += [f"{base}.branch2"] + [f"{base}.branch2.{j}" for j in range(8)]
        names += ["conv5", "conv5.0", "conv5.1", "conv5.2"]
        if self.num_classes:
            names.append("fc")
        return names

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        specs = [("conv1.0.weight", (3, 3, 3, self.stem_ch), "conv")]
        specs += _bn_specs("conv1.1", self.stem_ch)
        for si, units in enumerate(self.stages, start=2):
            for ui, unit in enumerate(units):
                base = f"stage{si}.{ui}"
                bf = unit.branch
                if unit.downsample:
                    specs += [(f"{base}.branch1.0.weight", (3, 3, 1, unit.c_in), "dwconv")]
                    specs += _bn_specs(f"{base}.branch1.1", unit.c_in)
                    specs += [(f"{base}.branch1.2.weight", (1, 1, unit.c_in, bf), "conv")]
                    specs += _bn_specs(f"{base}.branch1.3", bf)
                b2_in = unit.c_in if unit.downsample else bf
                specs += [(f"{base}.branch2.0.weight", (1, 1, b2_in, bf), "conv")]
                specs += _bn_specs(f"{base}.branch2.1", bf)
                specs += [(f"{base}.branch2.3.weight", (3, 3, 1, bf), "dwconv")]
                specs += _bn_specs(f"{base}.branch2.4", bf)
                specs += [(f"{base}.branch2.5.weight", (1, 1, bf, bf), "conv")]
                specs += _bn_specs(f"{base}.branch2.6", bf)
        specs += [("conv5.0.weight", (1, 1, self.stages[-1][-1].c_out, self.conv5_ch), "conv")]
        specs += _bn_specs("conv5.1", self.conv5_ch)
        if self.num_classes:
            specs += [
                ("fc.weight", (self.conv5_ch, self.num_classes), "fc"),
                ("fc.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """Kaiming-normal fan-out convs (the zoo-family convention here;
        torchvision leaves ShuffleNet on nn defaults — random init is for
        tests only, real use imports checkpoints), unit BN, normal(0.01) fc."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind in ("conv", "dwconv"):
                fan_out = shape[0] * shape[1] * shape[3]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
            elif kind == "fc":
                params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.01
            elif kind == "bn_w":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision ShuffleNetV2 state dict: convs OIHW→HWIO
        (depthwise (C,1,3,3) via the same transpose), fc transposed."""
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

    def _branch1(self, params, x, base, unit, tap):
        p = f"{base}.branch1"
        h = tap(f"{p}.0", conv2d(x, params[f"{p}.0.weight"], stride=unit.stride,
                                 padding=1, groups=unit.c_in))
        h = tap(f"{p}.1", self._bn(params, f"{p}.1", h))
        h = tap(f"{p}.2", conv2d(h, params[f"{p}.2.weight"]))
        h = tap(f"{p}.3", self._bn(params, f"{p}.3", h))
        h = tap(f"{p}.4", jax.nn.relu(h))
        return tap(p, h)

    def _branch2(self, params, x, base, unit, tap):
        p = f"{base}.branch2"
        h = tap(f"{p}.0", conv2d(x, params[f"{p}.0.weight"]))
        h = tap(f"{p}.1", self._bn(params, f"{p}.1", h))
        h = tap(f"{p}.2", jax.nn.relu(h))
        h = tap(f"{p}.3", conv2d(h, params[f"{p}.3.weight"], stride=unit.stride,
                                 padding=1, groups=unit.branch))
        h = tap(f"{p}.4", self._bn(params, f"{p}.4", h))
        h = tap(f"{p}.5", conv2d(h, params[f"{p}.5.weight"]))
        h = tap(f"{p}.6", self._bn(params, f"{p}.6", h))
        h = tap(f"{p}.7", jax.nn.relu(h))
        return tap(p, h)

    def _unit(self, params, x, base, unit: _Unit, tap):
        if unit.downsample:
            out = jnp.concatenate(
                [self._branch1(params, x, base, unit, tap),
                 self._branch2(params, x, base, unit, tap)], axis=-1,
            )
        else:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out = jnp.concatenate(
                [x1, self._branch2(params, x2, base, unit, tap)], axis=-1,
            )
        return tap(base, channel_shuffle(out, 2))

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = tap("conv1.0", conv2d(x, params["conv1.0.weight"], stride=2, padding=1))
        x = tap("conv1.1", self._bn(params, "conv1.1", x))
        x = tap("conv1.2", jax.nn.relu(x))
        x = tap("conv1", x)
        x = tap("maxpool", max_pool(x, window=3, stride=2, padding=1))
        for si, units in enumerate(self.stages, start=2):
            for ui, unit in enumerate(units):
                x = self._unit(params, x, f"stage{si}.{ui}", unit, tap)
            x = tap(f"stage{si}", x)
        x = tap("conv5.0", conv2d(x, params["conv5.0.weight"]))
        x = tap("conv5.1", self._bn(params, "conv5.1", x))
        x = tap("conv5.2", jax.nn.relu(x))
        x = tap("conv5", x)
        x = jnp.mean(x, axis=(1, 2))  # torchvision pools functionally
        if self.num_classes:
            logits = linear(x, params["fc.weight"], params["fc.bias"])
            return tap("fc", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        return f"ShuffleNetV2(variant={self.variant!r}, num_classes={self.num_classes})"
