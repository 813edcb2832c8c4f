"""Functional torchvision-compatible GoogLeNet / Inception-v3 with named taps.

GoogLeNet is *the* classic subject model of the feature-visualization /
interpretability literature (Olah et al.'s channel atlases are built on its
``mixed`` blocks), which makes it a first-class citizen for a semantic-audit
framework. Module and parameter names mirror ``torchvision.models.googlenet``
exactly, so a reference user's ``layer_names=["inception4e"]`` works verbatim
and pretrained torchvision checkpoints import with a pure relayout
(reference capability: any torch model via forward hooks, reference
activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- every conv is a BasicConv2d: bias-free Conv2d + BatchNorm2d(eps=0.001) +
  ReLU (taps at ``.conv``, ``.bn``, and the post-ReLU block name);
- ``branch3`` uses a **3×3** kernel despite the paper's 5×5 — torchvision
  reproduces the original Caffe bug and its checkpoints are trained that way;
- the stem/stage max-pools run in torch ``ceil_mode=True`` (layers.max_pool
  grows the right/bottom -inf padding to match);
- ``transform_input=True`` (the pretrained-weights builder default)
  re-normalizes from ImageNet stats to the (0.5, 0.5) training stats inside
  the forward;
- the aux classifiers (``aux1``/``aux2``) are train-time-only heads that
  torchvision drops at eval; they are omitted, and checkpoint keys for them
  are ignored by ``load_torch_state_dict``.

TPU mapping: inception blocks are four independent conv branches — XLA
schedules them as parallel MXU convolutions and fuses the concat into the
consumers; channels-last keeps the concat on the lane dimension (free).
Concatenation needs no LRP rule: its VJP is an exact slice-split, which
routes relevance to branches conservatively.
"""

from __future__ import annotations

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
    global_avg_pool,
    linear,
    max_pool,
)

# name -> (in, ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj)
_GOOGLENET_BLOCKS = (
    ("inception3a", (192, 64, 96, 128, 16, 32, 32)),
    ("inception3b", (256, 128, 128, 192, 32, 96, 64)),
    ("maxpool3", None),
    ("inception4a", (480, 192, 96, 208, 16, 48, 64)),
    ("inception4b", (512, 160, 112, 224, 24, 64, 64)),
    ("inception4c", (512, 128, 128, 256, 24, 64, 64)),
    ("inception4d", (512, 112, 144, 288, 32, 64, 64)),
    ("inception4e", (528, 256, 160, 320, 32, 128, 128)),
    ("maxpool4", None),
    ("inception5a", (832, 256, 160, 320, 32, 128, 128)),
    ("inception5b", (832, 384, 192, 384, 48, 128, 128)),
)


_bn_specs = bn_param_specs  # shared BN param layout (models/layers.py)


class GoogLeNet(SubjectModel):
    """GoogLeNet (Inception v1, BN flavor), channels-last, torch names.

    Parameters
    ----------
    num_classes : classifier width (0 → headless pooled features).
    transform_input : re-normalize ImageNet-normalized inputs to the
        (0.5, 0.5) stats the torchvision checkpoint was trained with
        (the pretrained-weights builder passes True).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-3

    def __init__(self, num_classes: int = 1000, *, transform_input: bool = False,
                 dtype=jnp.bfloat16):
        self.num_classes = num_classes
        self.transform_input = transform_input
        self.dtype = dtype
        self.num_features = 1024
        self.module_names = tuple(self._enumerate_module_names())

    # ------------------------------------------------------------------ names
    @staticmethod
    def _basic_names(prefix: str):
        return [prefix, f"{prefix}.conv", f"{prefix}.bn"]

    def _enumerate_module_names(self):
        names = self._basic_names("conv1") + ["maxpool1"]
        names += self._basic_names("conv2") + self._basic_names("conv3") + ["maxpool2"]
        for name, cfg in _GOOGLENET_BLOCKS:
            if cfg is None:
                names.append(name)
                continue
            names.append(name)
            names += [f"{name}.branch1"] + self._basic_names(f"{name}.branch1")[1:]
            for b, n_convs in (("branch2", 2), ("branch3", 2)):
                names.append(f"{name}.{b}")
                for i in range(n_convs):
                    names += self._basic_names(f"{name}.{b}.{i}")
            names += [f"{name}.branch4", f"{name}.branch4.0"]
            names += self._basic_names(f"{name}.branch4.1")
        names += ["avgpool", "dropout"]
        if self.num_classes:
            names.append("fc")
        return names

    # ------------------------------------------------------------------ specs
    @staticmethod
    def _basic_specs(prefix: str, c_in: int, c_out: int, k: int):
        return [(f"{prefix}.conv.weight", (k, k, c_in, c_out), "conv")] + _bn_specs(
            f"{prefix}.bn", c_out
        )

    def _param_specs(self):
        specs = self._basic_specs("conv1", 3, 64, 7)
        specs += self._basic_specs("conv2", 64, 64, 1)
        specs += self._basic_specs("conv3", 64, 192, 3)
        for name, cfg in _GOOGLENET_BLOCKS:
            if cfg is None:
                continue
            c_in, c1, c3r, c3, c5r, c5, cp = cfg
            specs += self._basic_specs(f"{name}.branch1", c_in, c1, 1)
            specs += self._basic_specs(f"{name}.branch2.0", c_in, c3r, 1)
            specs += self._basic_specs(f"{name}.branch2.1", c3r, c3, 3)
            specs += self._basic_specs(f"{name}.branch3.0", c_in, c5r, 1)
            specs += self._basic_specs(f"{name}.branch3.1", c5r, c5, 3)  # 3×3: torch quirk
            specs += self._basic_specs(f"{name}.branch4.1", c_in, cp, 1)
        if self.num_classes:
            specs += [
                ("fc.weight", (1024, self.num_classes), "fc"),
                ("fc.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """torchvision's scheme: truncated-normal(std=0.01) convs/linears
        (approximated by clipped normal), unit BN."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind in ("conv", "fc"):
                params[name] = (
                    jax.random.truncated_normal(sub, -2.0, 2.0, shape, jnp.float32) * 0.01
                )
            elif kind == "bn_w":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision GoogLeNet state dict (aux heads ignored):
        convs OIHW→HWIO, ``fc.weight`` transposed."""
        params = {}
        for name, shape, _ in self._param_specs():
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
            elif name == "fc.weight":
                arr = arr.T
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    # ------------------------------------------------------------------ apply
    def _basic(self, params, x, prefix, tap, *, stride=1, padding=0):
        if isinstance(padding, tuple):  # torch-style (ph, pw) → lax pairs
            padding = ((padding[0], padding[0]), (padding[1], padding[1]))
        x = tap(f"{prefix}.conv", conv2d(x, params[f"{prefix}.conv.weight"],
                                         stride=stride, padding=padding))
        x = tap(f"{prefix}.bn", batch_norm(
            x,
            params[f"{prefix}.bn.weight"],
            params[f"{prefix}.bn.bias"],
            params[f"{prefix}.bn.running_mean"],
            params[f"{prefix}.bn.running_var"],
            eps=self.BN_EPS,
        ))
        return tap(prefix, jax.nn.relu(x))

    def _inception(self, params, x, name, tap):
        b1 = tap(f"{name}.branch1", self._basic(params, x, f"{name}.branch1", tap))
        b2 = self._basic(params, x, f"{name}.branch2.0", tap)
        b2 = tap(f"{name}.branch2", self._basic(params, b2, f"{name}.branch2.1", tap, padding=1))
        b3 = self._basic(params, x, f"{name}.branch3.0", tap)
        b3 = tap(f"{name}.branch3", self._basic(params, b3, f"{name}.branch3.1", tap, padding=1))
        b4 = tap(f"{name}.branch4.0", max_pool(x, window=3, stride=1, padding=1, ceil_mode=True))
        b4 = tap(f"{name}.branch4", self._basic(params, b4, f"{name}.branch4.1", tap))
        return tap(name, jnp.concatenate([b1, b2, b3, b4], axis=-1))

    def _transform_input(self, x):
        """torchvision GoogLeNet._transform_input, channels-last."""
        scale = jnp.asarray([0.229, 0.224, 0.225], x.dtype) / 0.5
        shift = (jnp.asarray([0.485, 0.456, 0.406], x.dtype) - 0.5) / 0.5
        return x * scale + shift

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        if self.transform_input:
            x = self._transform_input(x)
        x = self._basic(params, x, "conv1", tap, stride=2, padding=3)
        x = tap("maxpool1", max_pool(x, window=3, stride=2, padding=0, ceil_mode=True))
        x = self._basic(params, x, "conv2", tap)
        x = self._basic(params, x, "conv3", tap, padding=1)
        x = tap("maxpool2", max_pool(x, window=3, stride=2, padding=0, ceil_mode=True))
        for name, cfg in _GOOGLENET_BLOCKS:
            if cfg is None:
                window = 3 if name == "maxpool3" else 2
                x = tap(name, max_pool(x, window=window, stride=2, padding=0, ceil_mode=True))
            else:
                x = self._inception(params, x, name, tap)
        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        x = tap("dropout", x)  # train-time-only: identity at inference
        if self.num_classes:
            logits = linear(x, params["fc.weight"], params["fc.bias"])
            return tap("fc", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        t = ", transform_input=True" if self.transform_input else ""
        return f"GoogLeNet(num_classes={self.num_classes}{t})"


# ---------------------------------------------------------------------------
# Inception v3
# ---------------------------------------------------------------------------

# Mixed_* schedule: (name, block_kind, c_in, block_arg)
#   A: block_arg = pool_features; C: block_arg = c7 (the 7×1/1×7 width).
_V3_MIXED = (
    ("Mixed_5b", "A", 192, 32),
    ("Mixed_5c", "A", 256, 64),
    ("Mixed_5d", "A", 288, 64),
    ("Mixed_6a", "B", 288, 0),
    ("Mixed_6b", "C", 768, 128),
    ("Mixed_6c", "C", 768, 160),
    ("Mixed_6d", "C", 768, 160),
    ("Mixed_6e", "C", 768, 192),
    ("Mixed_7a", "D", 768, 0),
    ("Mixed_7b", "E", 1280, 0),
    ("Mixed_7c", "E", 2048, 0),
)

# Per-block conv layout: branch name -> (k, padding) chains are encoded in the
# spec builders below; kernels may be asymmetric tuples ((1,7) etc.).


class InceptionV3(SubjectModel):
    """Inception v3, channels-last, torchvision-compatible names.

    The canonical 299×299 subject of the original "going deeper" audit
    studies; torchvision name parity means ``layer_names=["Mixed_6e"]``
    works verbatim and pretrained checkpoints import by relayout.
    The train-time-only ``AuxLogits`` head is omitted (torchvision drops
    it at eval); its checkpoint keys are ignored.

    Parameters
    ----------
    num_classes : classifier width (0 → headless pooled features).
    transform_input : re-normalize ImageNet-normalized inputs to the
        (0.5, 0.5) stats (the pretrained-weights builder passes True).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    BN_EPS = 1e-3

    def __init__(self, num_classes: int = 1000, *, transform_input: bool = False,
                 dtype=jnp.bfloat16):
        self.num_classes = num_classes
        self.transform_input = transform_input
        self.dtype = dtype
        self.num_features = 2048
        self.module_names = tuple(n for n, _, _ in self._conv_specs_and_names()[1]) + tuple(
            self._extra_module_names()
        )

    # ------------------------------------------------------------ conv tables
    @staticmethod
    def _block_convs(kind: str, c_in: int, arg: int):
        """Yield (branch_name, [(conv_suffix, c_in, c_out, k, pad, stride), ...])."""
        if kind == "A":
            return [
                ("branch1x1", [("branch1x1", c_in, 64, 1, 0, 1)]),
                ("branch5x5", [("branch5x5_1", c_in, 48, 1, 0, 1),
                               ("branch5x5_2", 48, 64, 5, 2, 1)]),
                ("branch3x3dbl", [("branch3x3dbl_1", c_in, 64, 1, 0, 1),
                                  ("branch3x3dbl_2", 64, 96, 3, 1, 1),
                                  ("branch3x3dbl_3", 96, 96, 3, 1, 1)]),
                ("branch_pool", [("branch_pool", c_in, arg, 1, 0, 1)]),
            ]
        if kind == "B":
            return [
                ("branch3x3", [("branch3x3", c_in, 384, 3, 0, 2)]),
                ("branch3x3dbl", [("branch3x3dbl_1", c_in, 64, 1, 0, 1),
                                  ("branch3x3dbl_2", 64, 96, 3, 1, 1),
                                  ("branch3x3dbl_3", 96, 96, 3, 0, 2)]),
            ]
        if kind == "C":
            c7 = arg
            return [
                ("branch1x1", [("branch1x1", c_in, 192, 1, 0, 1)]),
                ("branch7x7", [("branch7x7_1", c_in, c7, 1, 0, 1),
                               ("branch7x7_2", c7, c7, (1, 7), (0, 3), 1),
                               ("branch7x7_3", c7, 192, (7, 1), (3, 0), 1)]),
                ("branch7x7dbl", [("branch7x7dbl_1", c_in, c7, 1, 0, 1),
                                  ("branch7x7dbl_2", c7, c7, (7, 1), (3, 0), 1),
                                  ("branch7x7dbl_3", c7, c7, (1, 7), (0, 3), 1),
                                  ("branch7x7dbl_4", c7, c7, (7, 1), (3, 0), 1),
                                  ("branch7x7dbl_5", c7, 192, (1, 7), (0, 3), 1)]),
                ("branch_pool", [("branch_pool", c_in, 192, 1, 0, 1)]),
            ]
        if kind == "D":
            return [
                ("branch3x3", [("branch3x3_1", c_in, 192, 1, 0, 1),
                               ("branch3x3_2", 192, 320, 3, 0, 2)]),
                ("branch7x7x3", [("branch7x7x3_1", c_in, 192, 1, 0, 1),
                                 ("branch7x7x3_2", 192, 192, (1, 7), (0, 3), 1),
                                 ("branch7x7x3_3", 192, 192, (7, 1), (3, 0), 1),
                                 ("branch7x7x3_4", 192, 192, 3, 0, 2)]),
            ]
        # E: the 2a/2b (and 3a/3b) pairs both consume their parent conv.
        return [
            ("branch1x1", [("branch1x1", c_in, 320, 1, 0, 1)]),
            ("branch3x3", [("branch3x3_1", c_in, 384, 1, 0, 1),
                           ("branch3x3_2a", 384, 384, (1, 3), (0, 1), 1),
                           ("branch3x3_2b", 384, 384, (3, 1), (1, 0), 1)]),
            ("branch3x3dbl", [("branch3x3dbl_1", c_in, 448, 1, 0, 1),
                              ("branch3x3dbl_2", 448, 384, 3, 1, 1),
                              ("branch3x3dbl_3a", 384, 384, (1, 3), (0, 1), 1),
                              ("branch3x3dbl_3b", 384, 384, (3, 1), (1, 0), 1)]),
            ("branch_pool", [("branch_pool", c_in, 192, 1, 0, 1)]),
        ]

    _STEM = (
        ("Conv2d_1a_3x3", 3, 32, 3, 0, 2),
        ("Conv2d_2a_3x3", 32, 32, 3, 0, 1),
        ("Conv2d_2b_3x3", 32, 64, 3, 1, 1),
        ("maxpool1", None, None, None, None, None),
        ("Conv2d_3b_1x1", 64, 80, 1, 0, 1),
        ("Conv2d_4a_3x3", 80, 192, 3, 0, 1),
        ("maxpool2", None, None, None, None, None),
    )

    def _conv_specs_and_names(self):
        """Build (param_specs, [(module_name, _, _)]) for every BasicConv2d."""
        specs, names = [], []

        def add_basic(prefix, cin, cout, k, _pad, _stride):
            kk = (k, k) if isinstance(k, int) else k
            specs.append((f"{prefix}.conv.weight", (kk[0], kk[1], cin, cout), "conv"))
            specs.extend(_bn_specs(f"{prefix}.bn", cout))
            names.extend((n, None, None) for n in (prefix, f"{prefix}.conv", f"{prefix}.bn"))

        for name, cin, cout, k, pad, stride in self._STEM:
            if cin is None:
                names.append((name, None, None))
            else:
                add_basic(name, cin, cout, k, pad, stride)
        for name, kind, c_in, arg in _V3_MIXED:
            names.append((name, None, None))
            for _branch, convs in self._block_convs(kind, c_in, arg):
                for suffix, cin, cout, k, pad, stride in convs:
                    add_basic(f"{name}.{suffix}", cin, cout, k, pad, stride)
        if self.num_classes:
            specs.append(("fc.weight", (2048, self.num_classes), "fc"))
            specs.append(("fc.bias", (self.num_classes,), "zeros"))
        return specs, names

    def _extra_module_names(self):
        names = ["avgpool", "dropout"]
        if self.num_classes:
            names.append("fc")
        return names

    def _param_specs(self):
        return self._conv_specs_and_names()[0]

    init = GoogLeNet.init
    load_torch_state_dict = GoogLeNet.load_torch_state_dict
    _basic = GoogLeNet._basic
    _transform_input = GoogLeNet._transform_input

    # ------------------------------------------------------------------ apply
    def _chain(self, params, x, name, convs, tap):
        for suffix, _cin, _cout, _k, pad, stride in convs:
            x = self._basic(params, x, f"{name}.{suffix}", tap, stride=stride, padding=pad)
        return x

    def _mixed(self, params, x, name, kind, c_in, arg, tap):
        branches = dict(self._block_convs(kind, c_in, arg))
        outs = []
        if kind in ("A", "C", "E"):
            if kind != "C":
                outs.append(self._chain(params, x, name, branches["branch1x1"], tap))
            else:
                outs.append(self._chain(params, x, name, branches["branch1x1"], tap))
                outs.append(self._chain(params, x, name, branches["branch7x7"], tap))
                outs.append(self._chain(params, x, name, branches["branch7x7dbl"], tap))
            if kind == "A":
                outs.append(self._chain(params, x, name, branches["branch5x5"], tap))
                outs.append(self._chain(params, x, name, branches["branch3x3dbl"], tap))
            if kind == "E":
                h = self._chain(params, x, name, branches["branch3x3"][:1], tap)
                outs.append(jnp.concatenate([
                    self._chain(params, h, name, branches["branch3x3"][1:2], tap),
                    self._chain(params, h, name, branches["branch3x3"][2:3], tap),
                ], axis=-1))
                h = self._chain(params, x, name, branches["branch3x3dbl"][:2], tap)
                outs.append(jnp.concatenate([
                    self._chain(params, h, name, branches["branch3x3dbl"][2:3], tap),
                    self._chain(params, h, name, branches["branch3x3dbl"][3:4], tap),
                ], axis=-1))
            pooled = avg_pool(x, window=3, stride=1, padding=1)
            outs.append(self._chain(params, pooled, name, branches["branch_pool"], tap))
        elif kind == "B":
            outs.append(self._chain(params, x, name, branches["branch3x3"], tap))
            outs.append(self._chain(params, x, name, branches["branch3x3dbl"], tap))
            outs.append(max_pool(x, window=3, stride=2, padding=0))
        else:  # D
            outs.append(self._chain(params, x, name, branches["branch3x3"], tap))
            outs.append(self._chain(params, x, name, branches["branch7x7x3"], tap))
            outs.append(max_pool(x, window=3, stride=2, padding=0))
        return tap(name, jnp.concatenate(outs, axis=-1))

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        if self.transform_input:
            x = self._transform_input(x)
        for name, cin, cout, k, pad, stride in self._STEM:
            if cin is None:
                x = tap(name, max_pool(x, window=3, stride=2, padding=0))
            else:
                x = self._basic(params, x, name, tap, stride=stride, padding=pad)
        for name, kind, c_in, arg in _V3_MIXED:
            x = self._mixed(params, x, name, kind, c_in, arg, tap)
        x = tap("avgpool", global_avg_pool(x)).reshape(x.shape[0], -1)
        x = tap("dropout", x)  # train-time-only: identity at inference
        if self.num_classes:
            logits = linear(x, params["fc.weight"], params["fc.bias"])
            return tap("fc", logits), tap.taps
        return x, tap.taps

    def __repr__(self):
        t = ", transform_input=True" if self.transform_input else ""
        return f"InceptionV3(num_classes={self.num_classes}{t})"
