"""Functional torchvision-compatible VGG with named activation taps.

VGG-11/13/16/19 (plain and batch-norm variants) — the classic XAI subject
architecture (most LRP literature, and crp's own examples, dissect VGG-16).
Module and parameter names mirror ``torchvision.models.vgg*`` exactly
(``features.{i}`` Sequential indices, ``classifier.{0,3,6}`` linears), so a
reference user's ``layer_names=["features.28"]`` works verbatim and
pretrained torchvision checkpoints import with a pure relayout
(reference capability: any torch model via forward hooks, reference
activation_based.py:41; this family matches torchvision's
``vgg11/13/16/19[_bn]``).

Torch-parity details that matter for checkpoint fidelity:

- the pre-classifier flatten is **channel-major** (torch flattens NCHW), so
  the NHWC pooled activations transpose before the reshape and
  ``classifier.0.weight`` imports unchanged;
- the 7×7 adaptive average pool is an exact no-op at 224² input (the last
  maxpool already yields 7×7) and an exact mean-pool divisor otherwise;
- dropout is inference-mode identity.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import batch_norm, conv2d, linear, max_pool

# torchvision cfgs: number = conv output channels, "M" = 2×2 maxpool.
_CFGS = {
    11: (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    13: (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    16: (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"),
    19: (
        64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
        512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
    ),
}


class VGG(SubjectModel):
    """VGG-11/13/16/19, channels-last, torchvision-compatible names.

    Parameters
    ----------
    depth : one of 11, 13, 16, 19.
    num_classes : classifier width (0 → headless: returns the 4096-d
        penultimate activation, after ``classifier.4``'s ReLU).
    batch_norm : the ``vgg*_bn`` variant (conv → BN → ReLU triplets).
    dtype : activation dtype (bfloat16 by default — the MXU-native dtype).
    """

    def __init__(self, depth: int = 16, num_classes: int = 1000, *, batch_norm: bool = False,
                 dtype=jnp.bfloat16):
        if depth not in _CFGS:
            raise ValueError(f"depth must be one of {sorted(_CFGS)}, got {depth}")
        self.depth = depth
        self.num_classes = num_classes
        self.bn = batch_norm
        self.dtype = dtype
        # (feature_index, kind, channels) walk of the torchvision Sequential.
        self._plan: list[tuple[int, str, int]] = []
        idx, cin = 0, 3
        for item in _CFGS[depth]:
            if item == "M":
                self._plan.append((idx, "pool", cin))
                idx += 1
            else:
                self._plan.append((idx, "conv", item))
                idx += 1
                if batch_norm:
                    self._plan.append((idx, "bn", item))
                    idx += 1
                self._plan.append((idx, "relu", item))
                idx += 1
                cin = item
        self.module_names = tuple(self._enumerate_module_names())

    def _enumerate_module_names(self):
        names = ["features"] + [f"features.{i}" for i, _, _ in self._plan]
        names += ["avgpool", "classifier"]
        # classifier.2/.5 are torchvision's Dropout modules — identity at
        # inference, but valid hook targets there, so valid tap names here.
        for i in (0, 1, 2, 3, 4, 5):
            names.append(f"classifier.{i}")
        if self.num_classes:
            names.append("classifier.6")
        return names

    # ------------------------------------------------------------------ specs
    def _param_specs(self):
        specs = []
        cin = 3
        for i, kind, ch in self._plan:
            if kind == "conv":
                specs += [
                    (f"features.{i}.weight", (3, 3, cin, ch), "conv"),
                    (f"features.{i}.bias", (ch,), "zeros"),
                ]
                cin = ch
            elif kind == "bn":
                specs += [
                    (f"features.{i}.weight", (ch,), "ones"),
                    (f"features.{i}.bias", (ch,), "zeros"),
                    (f"features.{i}.running_mean", (ch,), "zeros"),
                    (f"features.{i}.running_var", (ch,), "ones"),
                ]
        specs += [
            ("classifier.0.weight", (512 * 7 * 7, 4096), "fc"),
            ("classifier.0.bias", (4096,), "zeros"),
            ("classifier.3.weight", (4096, 4096), "fc"),
            ("classifier.3.bias", (4096,), "zeros"),
        ]
        if self.num_classes:
            specs += [
                ("classifier.6.weight", (4096, self.num_classes), "fc"),
                ("classifier.6.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """Kaiming-normal convs / normal(0.01) fcs (torchvision's scheme)."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "conv":
                fan_in = shape[0] * shape[1] * shape[2]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_in)
            elif kind == "fc":
                params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.01
            elif kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    # ------------------------------------------------------------------ apply
    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)

        for i, kind, _ch in self._plan:
            if kind == "conv":
                x = conv2d(x, params[f"features.{i}.weight"], params[f"features.{i}.bias"], padding=1)
            elif kind == "bn":
                x = batch_norm(
                    x,
                    params[f"features.{i}.weight"],
                    params[f"features.{i}.bias"],
                    params[f"features.{i}.running_mean"],
                    params[f"features.{i}.running_var"],
                )
            elif kind == "relu":
                x = jax.nn.relu(x)
            else:  # pool
                x = max_pool(x, window=2, stride=2, padding=0)
            x = tap(f"features.{i}", x)
        x = tap("features", x)

        # AdaptiveAvgPool2d((7, 7)): identity at 224² input; exact mean-pool
        # when H is a multiple of 7 otherwise.
        b, h, w, c = x.shape
        if (h, w) != (7, 7):
            if h % 7 or w % 7:
                raise ValueError(f"VGG input must pool to 7x7; got feature map {h}x{w}")
            x = jnp.mean(x.reshape(b, 7, h // 7, 7, w // 7, c), axis=(2, 4))
        x = tap("avgpool", x)

        # torch flattens NCHW → channel-major columns of classifier.0.weight.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, c * 7 * 7)
        x = tap("classifier.0", linear(x, params["classifier.0.weight"], params["classifier.0.bias"]))
        x = tap("classifier.2", tap("classifier.1", jax.nn.relu(x)))  # .2 = Dropout (identity)
        x = tap("classifier.3", linear(x, params["classifier.3.weight"], params["classifier.3.bias"]))
        x = tap("classifier.5", tap("classifier.4", jax.nn.relu(x)))  # .5 = Dropout (identity)
        if self.num_classes:
            logits = tap(
                "classifier.6",
                linear(x, params["classifier.6.weight"], params["classifier.6.bias"]),
            )
            logits = tap("classifier", logits)
            return logits, tap.taps
        x = tap("classifier", x)
        return x, tap.taps

    # ------------------------------------------------------------- torch load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision VGG state dict (convs OIHW→HWIO, linears
        transposed; ``classifier.0`` columns stay channel-major — matched by
        the transpose-before-flatten in :meth:`apply`)."""
        params = {}
        for name, shape, _ in self._param_specs():
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

    def __repr__(self):
        bn = ", batch_norm=True" if self.bn else ""
        return f"VGG(depth={self.depth}, num_classes={self.num_classes}{bn})"
