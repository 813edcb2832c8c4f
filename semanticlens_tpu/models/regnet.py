"""Functional torchvision-compatible RegNet (X and Y) with named taps.

RegNets (Radosavovic et al., "Designing Network Design Spaces", CVPR 2020)
are the quantized-linear-width family that parameterizes an entire design
space with five numbers. Module and parameter names mirror
``torchvision.models.regnet_x_*`` / ``regnet_y_*`` exactly
(``stem.{0,1}``, ``trunk_output.block{s}.block{s}-{i}.f.{a,b,se,c}``,
``proj``, ``fc``), so a reference user's
``layer_names=["trunk_output.block3"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference capability:
any torch model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- stage widths/depths are GENERATED from ``(depth, w_0, w_a, w_m)`` exactly
  as ``BlockParams.from_init_params``: float32 continuous widths, half-even
  rounding of the log-capacity, quantization to multiples of 8, then the
  group-compatibility pass using torchvision's ``_make_divisible`` — which
  is a known divergence from pycls's ``quantize_float`` (round-to-nearest):
  e.g. ``x_400mf``'s last stage is 400 wide here/in torchvision where
  pycls's original is 384;
- every stage downsamples (stride 2 in ``f.b``; the 1×1 ``proj`` shortcut
  carries the same stride), stem is 3×3/s2 at width 32;
- the Y-variants' SE squeeze width is ``round(0.25 * block_INPUT_width)``
  (so the first block of each stage squeezes against the previous stage's
  width), applied between ``f.b`` and ``f.c``;
- group count is ``bottleneck_width // group_width`` with the group width
  clamped to the stage width;
- ``proj`` exists only where input width or stride changes (every stage's
  block 0 here, since all stages stride); there is no ``flatten`` module
  (torchvision calls ``torch.flatten`` functionally).

TPU mapping: 1×1 convs are MXU matmuls; the grouped 3×3 lands on the MXU
with per-group tiles (same codegen class as ResNeXt — see
docs/PERF_NOTES.md "Subject-model zoo" on group-width occupancy); SE is two
tiny vector matmuls on the pooled (B, C) tensor and carries the CP-LRP
constant-gate rule under attribution (models/layers.py ``gate_scale``).
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
    linear,
    load_torch_params,
    residual_add,
)

_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)

# variant -> (depth, w_0, w_a, w_m, group_width, se_ratio)
# (torchvision's regnet_{x,y}_* BlockParams.from_init_params arguments)
_VARIANTS = {
    "x_400mf": (22, 24, 24.48, 2.54, 16, None),
    "x_800mf": (16, 56, 35.73, 2.28, 16, None),
    "x_1_6gf": (18, 80, 34.01, 2.25, 24, None),
    "x_3_2gf": (25, 88, 26.31, 2.25, 48, None),
    "x_8gf": (23, 80, 49.56, 2.88, 120, None),
    "x_16gf": (22, 216, 55.59, 2.1, 128, None),
    "x_32gf": (23, 320, 69.86, 2.0, 168, None),
    "y_400mf": (16, 48, 27.89, 2.09, 8, 0.25),
    "y_800mf": (14, 56, 38.84, 2.4, 16, 0.25),
    "y_1_6gf": (27, 48, 20.71, 2.65, 24, 0.25),
    "y_3_2gf": (21, 80, 42.63, 2.66, 24, 0.25),
    "y_8gf": (17, 192, 76.82, 2.19, 56, 0.25),
    "y_16gf": (18, 200, 106.23, 2.48, 112, 0.25),
    "y_32gf": (20, 232, 115.89, 2.53, 232, 0.25),
}

_STEM_WIDTH = 32
_QUANT = 8


def generate_stage_params(depth: int, w_0: int, w_a: float, w_m: float,
                          group_width: int):
    """torchvision ``BlockParams.from_init_params`` width generation.

    Returns ``(stage_widths, stage_depths, stage_group_widths)``. Float32
    intermediate math and half-even rounding reproduce torch's tensor ops;
    the group-compatibility quantization uses ``_make_divisible`` (the
    torchvision choice — see module docstring for the pycls divergence).
    """
    if w_a < 0 or w_0 <= 0 or w_m <= 1 or w_0 % 8 != 0:
        raise ValueError("invalid RegNet generation parameters")
    widths_cont = np.arange(depth, dtype=np.float32) * np.float32(w_a) + np.float32(w_0)
    capacity = np.round(np.log(widths_cont / np.float32(w_0)) / np.float32(math.log(w_m)))
    block_widths = (
        np.round(np.float32(w_0) * np.power(np.float32(w_m), capacity) / _QUANT) * _QUANT
    ).astype(int)
    stage_widths: list[int] = []
    stage_depths: list[int] = []
    for w in block_widths.tolist():
        if stage_widths and stage_widths[-1] == w:
            stage_depths[-1] += 1
        else:
            stage_widths.append(w)
            stage_depths.append(1)
    groups = [min(group_width, w) for w in stage_widths]
    stage_widths = [_make_divisible(w, g) for w, g in zip(stage_widths, groups)]
    return stage_widths, stage_depths, groups


class _RegBlock:
    """One ResBottleneckBlock instance (bottleneck_multiplier = 1)."""

    def __init__(self, c_in, c_out, stride, group_width, se_ratio):
        self.c_in = c_in
        self.c_out = c_out
        self.stride = stride
        self.groups = c_out // group_width
        self.c_se = int(round(se_ratio * c_in)) if se_ratio else 0
        self.has_proj = c_in != c_out or stride != 1


class RegNet(SubjectModel):
    """RegNetX / RegNetY, channels-last, torchvision-compatible names.

    Parameters
    ----------
    variant : e.g. ``"y_400mf"``, ``"x_3_2gf"`` — any of ``RegNet.VARIANTS``
        (the torchvision ``regnet_{variant}`` model set).
    num_classes : classifier width (0 → headless pooled features).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-5
    VARIANTS = tuple(_VARIANTS)

    def __init__(self, variant: str = "y_400mf", num_classes: int = 1000, *,
                 dtype=jnp.bfloat16):
        if variant not in _VARIANTS:
            raise ValueError(f"variant must be one of {sorted(_VARIANTS)}, got {variant!r}")
        self.variant = variant
        self.num_classes = num_classes
        self.dtype = dtype
        depth, w_0, w_a, w_m, group_width, se_ratio = _VARIANTS[variant]
        widths, depths, groups = generate_stage_params(depth, w_0, w_a, w_m, group_width)
        self.stage_widths = tuple(widths)
        self.stage_depths = tuple(depths)
        self.stages: list[list[_RegBlock]] = []
        c_in = _STEM_WIDTH
        for w, d, g in zip(widths, depths, groups):
            blocks = []
            for i in range(d):
                blocks.append(_RegBlock(c_in if i == 0 else w, w, 2 if i == 0 else 1,
                                        g, se_ratio))
            self.stages.append(blocks)
            c_in = w
        self.num_features = widths[-1]
        self.module_names = tuple(self._enumerate_module_names())

    # ----------------------------------------------------------------- names
    def _block_names(self, base: str, blk: _RegBlock):
        names = [base]
        if blk.has_proj:
            names += [f"{base}.proj", f"{base}.proj.0", f"{base}.proj.1"]
        names.append(f"{base}.f")
        for part in ("a", "b"):
            names += [f"{base}.f.{part}", f"{base}.f.{part}.0",
                      f"{base}.f.{part}.1", f"{base}.f.{part}.2"]
        if blk.c_se:
            se = f"{base}.f.se"
            names += [se, f"{se}.avgpool", f"{se}.fc1", f"{se}.activation",
                      f"{se}.fc2", f"{se}.scale_activation"]
        names += [f"{base}.f.c", f"{base}.f.c.0", f"{base}.f.c.1",
                  f"{base}.activation"]
        return names

    def _enumerate_module_names(self):
        names = ["stem", "stem.0", "stem.1", "stem.2", "trunk_output"]
        for si, blocks in enumerate(self.stages, start=1):
            stage = f"trunk_output.block{si}"
            names.append(stage)
            for bi, blk in enumerate(blocks):
                names += self._block_names(f"{stage}.block{si}-{bi}", blk)
        names.append("avgpool")
        if self.num_classes:
            names.append("fc")
        return names

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        specs = [("stem.0.weight", (3, 3, 3, _STEM_WIDTH), "conv")]
        specs += _bn_specs("stem.1", _STEM_WIDTH)
        for si, blocks in enumerate(self.stages, start=1):
            for bi, blk in enumerate(blocks):
                base = f"trunk_output.block{si}.block{si}-{bi}"
                if blk.has_proj:
                    specs.append((f"{base}.proj.0.weight",
                                  (1, 1, blk.c_in, blk.c_out), "conv"))
                    specs += _bn_specs(f"{base}.proj.1", blk.c_out)
                specs.append((f"{base}.f.a.0.weight", (1, 1, blk.c_in, blk.c_out), "conv"))
                specs += _bn_specs(f"{base}.f.a.1", blk.c_out)
                specs.append((f"{base}.f.b.0.weight",
                              (3, 3, blk.c_out // blk.groups, blk.c_out), "conv"))
                specs += _bn_specs(f"{base}.f.b.1", blk.c_out)
                if blk.c_se:
                    specs += [
                        (f"{base}.f.se.fc1.weight", (blk.c_out, blk.c_se), "se_fc"),
                        (f"{base}.f.se.fc1.bias", (blk.c_se,), "zeros"),
                        (f"{base}.f.se.fc2.weight", (blk.c_se, blk.c_out), "se_fc"),
                        (f"{base}.f.se.fc2.bias", (blk.c_out,), "zeros"),
                    ]
                specs.append((f"{base}.f.c.0.weight", (1, 1, blk.c_out, blk.c_out), "conv"))
                specs += _bn_specs(f"{base}.f.c.1", blk.c_out)
        if self.num_classes:
            specs += [
                ("fc.weight", (self.num_features, self.num_classes), "fc"),
                ("fc.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme: kaiming-normal fan-out for every Conv2d
        (incl. SE 1×1s), unit BN, normal(0, 0.01) + zero bias for the fc."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "conv":
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
        """Convert a torchvision RegNet state dict: convs OIHW→HWIO (grouped
        (O, I/g, k, k) via the same transpose), SE 1×1 convs squeezed to
        (in, out) linears, fc transposed."""
        return load_torch_params(self._param_specs(), state_dict)

    # ----------------------------------------------------------------- apply
    def _cna(self, params, x, prefix, tap, *, stride=1, kernel=1, groups=1, act=True):
        """One torchvision Conv2dNormActivation: conv → BN → (ReLU)."""
        pad = (kernel - 1) // 2
        x = tap(f"{prefix}.0", conv2d(x, params[f"{prefix}.0.weight"], stride=stride,
                                      padding=pad, groups=groups))
        x = batch_norm(
            x,
            params[f"{prefix}.1.weight"],
            params[f"{prefix}.1.bias"],
            params[f"{prefix}.1.running_mean"],
            params[f"{prefix}.1.running_var"],
            eps=self.BN_EPS,
        )
        x = tap(f"{prefix}.1", x)
        if act:
            x = tap(f"{prefix}.2", jax.nn.relu(x))
        return tap(prefix, x)

    def _squeeze_excite(self, params, x, prefix, tap):
        # Gate branch: constant under LRP (CP-LRP, models/layers.py).
        pooled = tap(f"{prefix}.avgpool", global_avg_pool(x))
        s = pooled.reshape(pooled.shape[0], -1)
        s = tap(f"{prefix}.fc1", linear(s, params[f"{prefix}.fc1.weight"], params[f"{prefix}.fc1.bias"]))
        s = tap(f"{prefix}.activation", jax.nn.relu(s))
        s = tap(f"{prefix}.fc2", linear(s, params[f"{prefix}.fc2.weight"], params[f"{prefix}.fc2.bias"]))
        s = tap(f"{prefix}.scale_activation", jax.nn.sigmoid(s))
        return tap(prefix, gate_scale(x, s[:, None, None, :]))

    def _block(self, params, x, base, blk: _RegBlock, tap):
        if blk.has_proj:
            sc = tap(f"{base}.proj.0", conv2d(x, params[f"{base}.proj.0.weight"],
                                              stride=blk.stride))
            sc = batch_norm(
                sc,
                params[f"{base}.proj.1.weight"],
                params[f"{base}.proj.1.bias"],
                params[f"{base}.proj.1.running_mean"],
                params[f"{base}.proj.1.running_var"],
                eps=self.BN_EPS,
            )
            sc = tap(f"{base}.proj", tap(f"{base}.proj.1", sc))
        else:
            sc = x
        h = self._cna(params, x, f"{base}.f.a", tap)
        h = self._cna(params, h, f"{base}.f.b", tap, stride=blk.stride, kernel=3,
                      groups=blk.groups)
        if blk.c_se:
            h = self._squeeze_excite(params, h, f"{base}.f.se", tap)
        h = self._cna(params, h, f"{base}.f.c", tap, act=False)
        h = tap(f"{base}.f", h)
        out = tap(f"{base}.activation", jax.nn.relu(residual_add(sc, h)))
        return tap(base, out)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        x = self._cna(params, x, "stem", tap, stride=2, kernel=3)
        for si, blocks in enumerate(self.stages, start=1):
            stage = f"trunk_output.block{si}"
            for bi, blk in enumerate(blocks):
                x = self._block(params, x, f"{stage}.block{si}-{bi}", blk, tap)
            x = tap(stage, x)
        x = tap("trunk_output", x)
        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        if self.num_classes:
            logits = linear(x, params["fc.weight"], params["fc.bias"])
            return tap("fc", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        return f"RegNet(variant={self.variant!r}, num_classes={self.num_classes})"
