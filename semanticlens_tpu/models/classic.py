"""Functional torchvision-compatible AlexNet and SqueezeNet with named taps.

The two classic pre-residual families. Module and parameter names mirror
``torchvision.models.alexnet`` / ``squeezenet1_0`` / ``squeezenet1_1``
exactly, so a reference user's ``layer_names=["features.10"]`` works
verbatim and pretrained torchvision checkpoints import with a pure relayout
(reference capability: any torch model via forward hooks, reference
activation_based.py:41). AlexNet in particular matters for parity: it is
the canonical interpretability demo subject (its conv filters are the
textbook "Gabor/color-blob" example the Collect stage visualizes).

Torch-parity details that matter for checkpoint fidelity:

- AlexNet's 11×11/s4 stem uses padding 2; the 6×6 adaptive average pool is
  an identity at 224² (the map is already 6×6) and an exact mean-pool when
  the map is a multiple of 6; the classifier flatten is channel-major
  (NCHW), matched by a transpose before the reshape;
- SqueezeNet's stem conv has NO padding (7×7/s2 in 1.0, 3×3/s2 in 1.1) and
  every max pool is 3×3/s2 with ``ceil_mode=True``; Fire modules concatenate
  ``expand1x1`` then ``expand3x3``; the classifier is a 1×1 conv on the
  feature map followed by global average pooling (so ``num_classes``
  changes a CONV width, not a linear);
- all convs carry biases in both families.

TPU mapping: AlexNet's big dense convs and the 9216→4096 linears are pure
MXU work; SqueezeNet's 1×1 squeeze/expand convs are MXU matmuls with the
3×3 expands the only spatial work — both are bandwidth-light and run far
above the ResNet-50 baseline (docs/PERF_NOTES.md "Subject-model zoo").
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import conv2d, linear, max_pool


def _load_torch_state_dict(self, state_dict):
    """Convert a torchvision state dict: convs OIHW→HWIO, linears
    transposed (shared by both families; biases pass through)."""
    params = {}
    for name, shape, kind in self._param_specs():
        value = state_dict[name]
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
        elif name.endswith("weight") and arr.ndim == 2:
            arr = arr.T
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
        params[name] = jnp.asarray(arr, jnp.float32)
    return params


def _init_from_specs(self, rng):
    """Kaiming-normal fan-out convs, normal(0.01) linears, zero biases —
    the zoo-family convention (random init is for tests; real use imports
    checkpoints)."""
    params = {}
    for name, shape, kind in self._param_specs():
        rng, sub = jax.random.split(rng)
        if kind == "conv":
            fan_out = shape[0] * shape[1] * shape[3]
            params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_out)
        elif kind == "fc":
            params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.01
        else:
            params[name] = jnp.zeros(shape, jnp.float32)
    return params


# AlexNet features plan: (index, kind, args)
_ALEX_FEATURES = (
    (0, "conv", (11, 4, 2, 3, 64)),     # kernel, stride, pad, c_in, c_out
    (1, "relu", None),
    (2, "pool", None),
    (3, "conv", (5, 1, 2, 64, 192)),
    (4, "relu", None),
    (5, "pool", None),
    (6, "conv", (3, 1, 1, 192, 384)),
    (7, "relu", None),
    (8, "conv", (3, 1, 1, 384, 256)),
    (9, "relu", None),
    (10, "conv", (3, 1, 1, 256, 256)),
    (11, "relu", None),
    (12, "pool", None),
)


class AlexNet(SubjectModel):
    """AlexNet, channels-last, torchvision-compatible names.

    Parameters
    ----------
    num_classes : classifier width (0 → headless pooled features, 9216-d).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    def __init__(self, num_classes: int = 1000, *, dtype=jnp.bfloat16):
        self.num_classes = num_classes
        self.dtype = dtype
        self.num_features = 256 * 6 * 6
        names = ["features"] + [f"features.{i}" for i, _, _ in _ALEX_FEATURES]
        names.append("avgpool")
        if num_classes:
            names += ["classifier"] + [f"classifier.{i}" for i in range(7)]
        self.module_names = tuple(names)

    def _param_specs(self):
        specs = []
        for i, kind, args in _ALEX_FEATURES:
            if kind == "conv":
                k, _s, _p, cin, cout = args
                specs += [(f"features.{i}.weight", (k, k, cin, cout), "conv"),
                          (f"features.{i}.bias", (cout,), "zeros")]
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (9216, 4096), "fc"),
                ("classifier.1.bias", (4096,), "zeros"),
                ("classifier.4.weight", (4096, 4096), "fc"),
                ("classifier.4.bias", (4096,), "zeros"),
                ("classifier.6.weight", (4096, self.num_classes), "fc"),
                ("classifier.6.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    init = _init_from_specs
    load_torch_state_dict = _load_torch_state_dict

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        for i, kind, args in _ALEX_FEATURES:
            if kind == "conv":
                k, s, p, _cin, _cout = args
                x = conv2d(x, params[f"features.{i}.weight"],
                           params[f"features.{i}.bias"], stride=s, padding=p)
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:
                x = max_pool(x, window=3, stride=2, padding=0)
            x = tap(f"features.{i}", x)
        x = tap("features", x)

        # AdaptiveAvgPool2d((6, 6)): identity at 224²; exact mean-pool when
        # the map is a multiple of 6.
        b, h, w, c = x.shape
        if (h, w) != (6, 6):
            if h % 6 or w % 6:
                raise ValueError(f"AlexNet input must pool to 6x6; got feature map {h}x{w}")
            x = jnp.mean(x.reshape(b, 6, h // 6, 6, w // 6, c), axis=(2, 4))
        x = tap("avgpool", x)

        # torch flattens NCHW → channel-major columns of classifier.1.weight.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * 36)
        if not self.num_classes:
            return x, tap.taps
        x = tap("classifier.0", x)  # Dropout: identity at inference
        x = tap("classifier.1", linear(x, params["classifier.1.weight"], params["classifier.1.bias"]))
        x = tap("classifier.3", tap("classifier.2", jax.nn.relu(x)))  # .3 = Dropout
        x = tap("classifier.4", linear(x, params["classifier.4.weight"], params["classifier.4.bias"]))
        x = tap("classifier.5", jax.nn.relu(x))
        logits = linear(x, params["classifier.6.weight"], params["classifier.6.bias"])
        logits = tap("classifier.6", logits)
        return tap("classifier", logits), tap.taps

    def __repr__(self):
        return f"AlexNet(num_classes={self.num_classes})"


# SqueezeNet plans: index -> ("conv", (k, s, c_in, c_out)) | "relu" | "pool"
#                         | ("fire", (c_in, squeeze, e1, e3))
_SQUEEZE_V10 = (
    (0, "conv", (7, 2, 3, 96)),
    (1, "relu", None),
    (2, "pool", None),
    (3, "fire", (96, 16, 64, 64)),
    (4, "fire", (128, 16, 64, 64)),
    (5, "fire", (128, 32, 128, 128)),
    (6, "pool", None),
    (7, "fire", (256, 32, 128, 128)),
    (8, "fire", (256, 48, 192, 192)),
    (9, "fire", (384, 48, 192, 192)),
    (10, "fire", (384, 64, 256, 256)),
    (11, "pool", None),
    (12, "fire", (512, 64, 256, 256)),
)
_SQUEEZE_V11 = (
    (0, "conv", (3, 2, 3, 64)),
    (1, "relu", None),
    (2, "pool", None),
    (3, "fire", (64, 16, 64, 64)),
    (4, "fire", (128, 16, 64, 64)),
    (5, "pool", None),
    (6, "fire", (128, 32, 128, 128)),
    (7, "fire", (256, 32, 128, 128)),
    (8, "pool", None),
    (9, "fire", (256, 48, 192, 192)),
    (10, "fire", (384, 48, 192, 192)),
    (11, "fire", (384, 64, 256, 256)),
    (12, "fire", (512, 64, 256, 256)),
)
_FIRE_PARTS = ("squeeze", "squeeze_activation", "expand1x1",
               "expand1x1_activation", "expand3x3", "expand3x3_activation")


class SqueezeNet(SubjectModel):
    """SqueezeNet 1.0 / 1.1, channels-last, torchvision-compatible names.

    Parameters
    ----------
    version : "1_0" | "1_1" (torchvision ``squeezenet{version}``).
    num_classes : classifier 1×1-conv width (0 → headless pooled 512-d).
    dtype : activation dtype (bfloat16 = the MXU-native default).
    """

    def __init__(self, version: str = "1_0", num_classes: int = 1000, *,
                 dtype=jnp.bfloat16):
        if version not in ("1_0", "1_1"):
            raise ValueError(f"version must be '1_0' or '1_1', got {version!r}")
        self.version = version
        self.num_classes = num_classes
        self.dtype = dtype
        self.plan = _SQUEEZE_V10 if version == "1_0" else _SQUEEZE_V11
        self.num_features = 512
        names = ["features"]
        for i, kind, _ in self.plan:
            names.append(f"features.{i}")
            if kind == "fire":
                names += [f"features.{i}.{p}" for p in _FIRE_PARTS]
        if num_classes:
            names += ["classifier"] + [f"classifier.{i}" for i in range(4)]
        self.module_names = tuple(names)

    def _param_specs(self):
        specs = []
        for i, kind, args in self.plan:
            if kind == "conv":
                k, _s, cin, cout = args
                specs += [(f"features.{i}.weight", (k, k, cin, cout), "conv"),
                          (f"features.{i}.bias", (cout,), "zeros")]
            elif kind == "fire":
                cin, sq, e1, e3 = args
                specs += [
                    (f"features.{i}.squeeze.weight", (1, 1, cin, sq), "conv"),
                    (f"features.{i}.squeeze.bias", (sq,), "zeros"),
                    (f"features.{i}.expand1x1.weight", (1, 1, sq, e1), "conv"),
                    (f"features.{i}.expand1x1.bias", (e1,), "zeros"),
                    (f"features.{i}.expand3x3.weight", (3, 3, sq, e3), "conv"),
                    (f"features.{i}.expand3x3.bias", (e3,), "zeros"),
                ]
        if self.num_classes:
            specs += [
                ("classifier.1.weight", (1, 1, 512, self.num_classes), "conv"),
                ("classifier.1.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    init = _init_from_specs
    load_torch_state_dict = _load_torch_state_dict

    def _fire(self, params, x, base, tap):
        s = tap(f"{base}.squeeze",
                conv2d(x, params[f"{base}.squeeze.weight"], params[f"{base}.squeeze.bias"]))
        s = tap(f"{base}.squeeze_activation", jax.nn.relu(s))
        e1 = tap(f"{base}.expand1x1",
                 conv2d(s, params[f"{base}.expand1x1.weight"], params[f"{base}.expand1x1.bias"]))
        e1 = tap(f"{base}.expand1x1_activation", jax.nn.relu(e1))
        e3 = tap(f"{base}.expand3x3",
                 conv2d(s, params[f"{base}.expand3x3.weight"], params[f"{base}.expand3x3.bias"],
                        padding=1))
        e3 = tap(f"{base}.expand3x3_activation", jax.nn.relu(e3))
        return tap(base, jnp.concatenate([e1, e3], axis=-1))

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)
        for i, kind, args in self.plan:
            if kind == "conv":
                k, s, _cin, _cout = args
                # torchvision stem: NO padding.
                x = tap(f"features.{i}",
                        conv2d(x, params[f"features.{i}.weight"],
                               params[f"features.{i}.bias"], stride=s, padding=0))
            elif kind == "relu":
                x = tap(f"features.{i}", jax.nn.relu(x))
            elif kind == "pool":
                x = tap(f"features.{i}",
                        max_pool(x, window=3, stride=2, padding=0, ceil_mode=True))
            else:
                x = self._fire(params, x, f"features.{i}", tap)
        x = tap("features", x)
        if not self.num_classes:
            return jnp.mean(x, axis=(1, 2)), tap.taps
        x = tap("classifier.0", x)  # Dropout: identity at inference
        x = tap("classifier.1",
                conv2d(x, params["classifier.1.weight"], params["classifier.1.bias"]))
        x = tap("classifier.2", jax.nn.relu(x))
        x = tap("classifier.3", jnp.mean(x, axis=(1, 2), keepdims=True))
        x = tap("classifier", x)  # hook parity: pre-flatten (B, 1, 1, n)
        return x.reshape(x.shape[0], -1), tap.taps

    def __repr__(self):
        return f"SqueezeNet(version={self.version!r}, num_classes={self.num_classes})"
