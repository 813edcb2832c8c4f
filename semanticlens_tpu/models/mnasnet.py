"""Functional torchvision-compatible MNASNet with named taps.

MNASNet (Tan et al., CVPR 2019) is the mobile-NAS inverted-residual family.
Module and parameter names mirror ``torchvision.models.mnasnet{0_5,0_75,
1_0,1_3}`` exactly (the flat ``layers.{0..16}`` trunk with nested
``layers.{8..13}.{i}.layers.{j}`` inverted residuals), so a reference
user's ``layer_names=["layers.12"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference capability:
any torch model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- channel depths are ``round_to_multiple_of(d * alpha, 8)`` with the 0.9
  round-up bias (same arithmetic as ``_make_divisible``) over the base
  table (32, 16, 24, 40, 80, 96, 192, 320);
- the stem is conv → depthwise → 1×1 projection laid out FLAT in
  ``layers.0..7`` (not nested blocks); six inverted-residual stacks sit at
  ``layers.8..13``; the 1280-d head conv at ``layers.14..16``;
- inverted residuals expand by an integer factor of the block INPUT width
  (``in * expansion``, no divisibility rounding), kernel 3 or 5 per stack;
- pooling is ``x.mean([2, 3])`` — there is no ``avgpool`` module.

TPU mapping: same codegen classes as MobileNetV2 (1×1 MXU matmuls, k×k
depthwise on the VPU — docs/PERF_NOTES.md "Subject-model zoo").
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
    linear,
    load_torch_params,
    residual_add,
)

_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)

_BASE_DEPTHS = (32, 16, 24, 40, 80, 96, 192, 320)
# stacks at layers.8..13: (kernel, stride, expansion, repeats)
_STACKS = ((3, 2, 3, 3), (5, 2, 3, 3), (5, 2, 6, 3), (3, 1, 6, 2), (5, 2, 6, 4), (3, 1, 6, 1))
_VARIANTS = {"0_5": 0.5, "0_75": 0.75, "1_0": 1.0, "1_3": 1.3}
_HEAD = 1280


class _IRBlock:
    """One torchvision mnasnet._InvertedResidual instance."""

    def __init__(self, c_in, c_out, kernel, stride, expansion):
        self.c_in = c_in
        self.c_out = c_out
        self.kernel = kernel
        self.stride = stride
        self.c_mid = c_in * expansion
        self.residual = c_in == c_out and stride == 1


class MNASNet(SubjectModel):
    """MNASNet α ∈ {0.5, 0.75, 1.0, 1.3}, channels-last, torch names.

    Parameters
    ----------
    variant : "0_5" | "0_75" | "1_0" | "1_3" (torchvision ``mnasnet{v}``).
    num_classes : classifier width (0 → headless pooled 1280-d features).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-5

    def __init__(self, variant: str = "1_0", num_classes: int = 1000, *,
                 dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        alpha = _VARIANTS[variant]
        self.depths = tuple(_make_divisible(d * alpha) for d in _BASE_DEPTHS)
        self.stacks: list[list[_IRBlock]] = []
        for si, (kernel, stride, expansion, repeats) in enumerate(_STACKS):
            c_in, c_out = self.depths[si + 1], self.depths[si + 2]
            blocks = [_IRBlock(c_in, c_out, kernel, stride, expansion)]
            blocks += [_IRBlock(c_out, c_out, kernel, 1, expansion) for _ in range(repeats - 1)]
            self.stacks.append(blocks)
        self.num_features = _HEAD
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["layers"] + [f"layers.{i}" for i in range(8)]
        for si, blocks in enumerate(self.stacks):
            stack = f"layers.{8 + si}"
            names.append(stack)
            for bi, _blk in enumerate(blocks):
                base = f"{stack}.{bi}"
                names += [base, f"{base}.layers"]
                names += [f"{base}.layers.{j}" for j in range(8)]
        names += [f"layers.{i}" for i in (14, 15, 16)]
        if self.num_classes:
            names += ["classifier", "classifier.0", "classifier.1"]
        return names

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        d0, d1 = self.depths[0], self.depths[1]
        specs = [("layers.0.weight", (3, 3, 3, d0), "conv")]
        specs += _bn_specs("layers.1", d0)
        specs += [("layers.3.weight", (3, 3, 1, d0), "dwconv")]
        specs += _bn_specs("layers.4", d0)
        specs += [("layers.6.weight", (1, 1, d0, d1), "conv")]
        specs += _bn_specs("layers.7", d1)
        for si, blocks in enumerate(self.stacks):
            for bi, blk in enumerate(blocks):
                base = f"layers.{8 + si}.{bi}.layers"
                k = blk.kernel
                specs += [(f"{base}.0.weight", (1, 1, blk.c_in, blk.c_mid), "conv")]
                specs += _bn_specs(f"{base}.1", blk.c_mid)
                specs += [(f"{base}.3.weight", (k, k, 1, blk.c_mid), "dwconv")]
                specs += _bn_specs(f"{base}.4", blk.c_mid)
                specs += [(f"{base}.6.weight", (1, 1, blk.c_mid, blk.c_out), "conv")]
                specs += _bn_specs(f"{base}.7", blk.c_out)
        specs += [("layers.14.weight", (1, 1, self.depths[-1], _HEAD), "conv")]
        specs += _bn_specs("layers.15", _HEAD)
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (_HEAD, self.num_classes), "fc"),
                ("classifier.1.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme: kaiming-normal fan-out convs, unit BN,
        kaiming-uniform(sigmoid) classifier approximated as normal(0.01)."""
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
        """Convert a torchvision MNASNet state dict: convs OIHW→HWIO
        (depthwise via the same transpose), classifier transposed."""
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

    def _ir_block(self, params, x, base, blk: _IRBlock, tap):
        p = f"{base}.layers"
        h = tap(f"{p}.0", conv2d(x, params[f"{p}.0.weight"]))
        h = tap(f"{p}.1", self._bn(params, f"{p}.1", h))
        h = tap(f"{p}.2", jax.nn.relu(h))
        h = tap(f"{p}.3", conv2d(h, params[f"{p}.3.weight"], stride=blk.stride,
                                 padding=blk.kernel // 2, groups=blk.c_mid))
        h = tap(f"{p}.4", self._bn(params, f"{p}.4", h))
        h = tap(f"{p}.5", jax.nn.relu(h))
        h = tap(f"{p}.6", conv2d(h, params[f"{p}.6.weight"]))
        h = tap(f"{p}.7", self._bn(params, f"{p}.7", h))
        h = tap(p, h)
        if blk.residual:
            h = residual_add(x, h)  # LRP: proportional split, not a bare +
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = tap("layers.0", conv2d(x, params["layers.0.weight"], stride=2, padding=1))
        x = tap("layers.1", self._bn(params, "layers.1", x))
        x = tap("layers.2", jax.nn.relu(x))
        x = tap("layers.3", conv2d(x, params["layers.3.weight"], padding=1,
                                   groups=self.depths[0]))
        x = tap("layers.4", self._bn(params, "layers.4", x))
        x = tap("layers.5", jax.nn.relu(x))
        x = tap("layers.6", conv2d(x, params["layers.6.weight"]))
        x = tap("layers.7", self._bn(params, "layers.7", x))
        for si, blocks in enumerate(self.stacks):
            stack = f"layers.{8 + si}"
            for bi, blk in enumerate(blocks):
                x = self._ir_block(params, x, f"{stack}.{bi}", blk, tap)
            x = tap(stack, x)
        x = tap("layers.14", conv2d(x, params["layers.14.weight"]))
        x = tap("layers.15", self._bn(params, "layers.15", x))
        x = tap("layers.16", jax.nn.relu(x))
        x = tap("layers", x)
        x = jnp.mean(x, axis=(1, 2))  # torchvision pools functionally
        if not self.num_classes:
            return x, tap.taps
        x = tap("classifier.0", x)  # Dropout: identity at inference
        logits = linear(x, params["classifier.1.weight"], params["classifier.1.bias"])
        logits = tap("classifier.1", logits)
        return tap("classifier", logits), tap.taps

    def __repr__(self):
        return f"MNASNet(variant={self.variant!r}, num_classes={self.num_classes})"
