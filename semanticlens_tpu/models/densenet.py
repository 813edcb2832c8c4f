"""Functional torchvision-compatible DenseNet with named activation taps.

DenseNet-121/161/169/201 — a standard interpretability subject (dense
concatenation makes per-channel concepts unusually traceable, since every
layer's output channels survive verbatim to the block output). Module and
parameter names mirror ``torchvision.models.densenet*`` exactly
(``features.denseblock{i}.denselayer{j}.conv2`` etc.), so a reference user's
``layer_names=["features.denseblock3"]`` works verbatim and pretrained
torchvision checkpoints import with a pure relayout (reference capability:
any torch model via forward hooks, reference activation_based.py:41).

Torch-parity details that matter for checkpoint fidelity:

- every conv is bias-free (affine BN carries the shift);
- a ``denselayer``'s hook output is the **new** ``growth_rate`` features
  only — concatenation onto the running feature map happens in the parent
  block, so that is what the same tap returns here;
- the final ReLU + global average pool are functional in torchvision (no
  module, so no hookable name) — same here: ``features.norm5`` is the last
  conv-path tap, then ``classifier`` sees the pooled vector.

Dense blocks are concat-heavy, which XLA handles well on TPU: concatenate on
the (last, lane-aligned) channel axis fuses with the consuming 1×1 conv, so
the whole bottleneck chain lowers to MXU matmuls without materialising the
growing feature map more than once per layer.
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
    global_avg_pool,
    linear,
    max_pool,
)

# depth -> (growth_rate, block_config, num_init_features); bn_size is 4 for all.
_CFGS = {
    121: (32, (6, 12, 24, 16), 64),
    161: (48, (6, 12, 36, 24), 96),
    169: (32, (6, 12, 32, 32), 64),
    201: (32, (6, 12, 48, 32), 64),
}
_BN_SIZE = 4


class DenseNet(SubjectModel):
    """DenseNet-121/161/169/201, channels-last, torchvision-compatible names.

    Parameters
    ----------
    depth : one of 121, 161, 169, 201.
    num_classes : classifier width (0 → headless: returns the pooled
        ``num_features``-d vector after the final functional ReLU).
    dtype : activation dtype (bfloat16 by default — the MXU-native dtype).
    """

    def __init__(self, depth: int = 121, num_classes: int = 1000, *, dtype=jnp.bfloat16):
        if depth not in _CFGS:
            raise ValueError(f"depth must be one of {sorted(_CFGS)}, got {depth}")
        self.depth = depth
        self.num_classes = num_classes
        self.dtype = dtype
        self.growth_rate, self.block_config, self.num_init_features = _CFGS[depth]

        # Channel walk (torchvision _DenseBlock/_Transition arithmetic).
        self._blocks: list[tuple[int, int, int]] = []  # (block_idx, n_layers, c_in)
        c = self.num_init_features
        for bi, n_layers in enumerate(self.block_config, start=1):
            self._blocks.append((bi, n_layers, c))
            c += n_layers * self.growth_rate
            if bi != len(self.block_config):
                c = c // 2  # transition halves channels
        self.num_features = c
        self.module_names = tuple(self._enumerate_module_names())

    def _enumerate_module_names(self):
        names = ["features", "features.conv0", "features.norm0", "features.relu0", "features.pool0"]
        for bi, n_layers, _ in self._blocks:
            names.append(f"features.denseblock{bi}")
            for li in range(1, n_layers + 1):
                base = f"features.denseblock{bi}.denselayer{li}"
                names.append(base)
                names += [f"{base}.{m}" for m in ("norm1", "relu1", "conv1", "norm2", "relu2", "conv2")]
            if bi != len(self.block_config):
                t = f"features.transition{bi}"
                names += [t] + [f"{t}.{m}" for m in ("norm", "relu", "conv", "pool")]
        names.append("features.norm5")
        if self.num_classes:
            names.append("classifier")
        return names

    # ------------------------------------------------------------------ specs
    def _bn_specs(self, prefix: str, ch: int):
        return bn_param_specs(prefix, ch, ones_kind="ones")

    def _param_specs(self):
        g, bottleneck = self.growth_rate, _BN_SIZE * self.growth_rate
        specs = [("features.conv0.weight", (7, 7, 3, self.num_init_features), "conv")]
        specs += self._bn_specs("features.norm0", self.num_init_features)
        for bi, n_layers, c_in in self._blocks:
            c = c_in
            for li in range(1, n_layers + 1):
                base = f"features.denseblock{bi}.denselayer{li}"
                specs += self._bn_specs(f"{base}.norm1", c)
                specs.append((f"{base}.conv1.weight", (1, 1, c, bottleneck), "conv"))
                specs += self._bn_specs(f"{base}.norm2", bottleneck)
                specs.append((f"{base}.conv2.weight", (3, 3, bottleneck, g), "conv"))
                c += g
            if bi != len(self.block_config):
                t = f"features.transition{bi}"
                specs += self._bn_specs(f"{t}.norm", c)
                specs.append((f"{t}.conv.weight", (1, 1, c, c // 2), "conv"))
        specs += self._bn_specs("features.norm5", self.num_features)
        if self.num_classes:
            specs += [
                ("classifier.weight", (self.num_features, self.num_classes), "fc"),
                ("classifier.bias", (self.num_classes,), "zeros"),
            ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """Kaiming-normal convs, unit BN, zero linear bias (torchvision's scheme)."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "conv":
                fan_in = shape[0] * shape[1] * shape[2]
                params[name] = jax.random.normal(sub, shape, jnp.float32) * math.sqrt(2.0 / fan_in)
            elif kind == "fc":
                fan_in = shape[0]
                bound = 1.0 / math.sqrt(fan_in)
                params[name] = jax.random.uniform(sub, shape, jnp.float32, -bound, bound)
            elif kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params

    # ------------------------------------------------------------------ apply
    def _dense_layer(self, params, x, base, tap):
        """One torchvision _DenseLayer: returns the NEW growth_rate features."""
        h = batch_norm(
            x,
            params[f"{base}.norm1.weight"],
            params[f"{base}.norm1.bias"],
            params[f"{base}.norm1.running_mean"],
            params[f"{base}.norm1.running_var"],
        )
        h = tap(f"{base}.norm1", h)
        h = tap(f"{base}.relu1", jax.nn.relu(h))
        h = tap(f"{base}.conv1", conv2d(h, params[f"{base}.conv1.weight"]))
        h = batch_norm(
            h,
            params[f"{base}.norm2.weight"],
            params[f"{base}.norm2.bias"],
            params[f"{base}.norm2.running_mean"],
            params[f"{base}.norm2.running_var"],
        )
        h = tap(f"{base}.norm2", h)
        h = tap(f"{base}.relu2", jax.nn.relu(h))
        h = conv2d(h, params[f"{base}.conv2.weight"], padding=1)
        h = tap(f"{base}.conv2", h)
        return tap(base, h)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) float → (logits, taps). Conv taps are NHWC."""
        tap = TapCollector(tap_names)
        x = x.astype(self.dtype)

        x = tap("features.conv0", conv2d(x, params["features.conv0.weight"], stride=2, padding=3))
        x = batch_norm(
            x,
            params["features.norm0.weight"],
            params["features.norm0.bias"],
            params["features.norm0.running_mean"],
            params["features.norm0.running_var"],
        )
        x = tap("features.norm0", x)
        x = tap("features.relu0", jax.nn.relu(x))
        x = tap("features.pool0", max_pool(x, window=3, stride=2, padding=1))

        for bi, n_layers, _ in self._blocks:
            for li in range(1, n_layers + 1):
                new = self._dense_layer(params, x, f"features.denseblock{bi}.denselayer{li}", tap)
                x = jnp.concatenate([x, new], axis=-1)
            x = tap(f"features.denseblock{bi}", x)
            if bi != len(self.block_config):
                t = f"features.transition{bi}"
                x = batch_norm(
                    x,
                    params[f"{t}.norm.weight"],
                    params[f"{t}.norm.bias"],
                    params[f"{t}.norm.running_mean"],
                    params[f"{t}.norm.running_var"],
                )
                x = tap(f"{t}.norm", x)
                x = tap(f"{t}.relu", jax.nn.relu(x))
                x = tap(f"{t}.conv", conv2d(x, params[f"{t}.conv.weight"]))
                x = tap(t, tap(f"{t}.pool", avg_pool(x, window=2, stride=2, padding=0)))

        x = batch_norm(
            x,
            params["features.norm5.weight"],
            params["features.norm5.bias"],
            params["features.norm5.running_mean"],
            params["features.norm5.running_var"],
        )
        x = tap("features.norm5", x)
        x = tap("features", x)

        # torchvision: functional relu -> adaptive_avg_pool2d(1) -> flatten.
        x = global_avg_pool(jax.nn.relu(x)).reshape(x.shape[0], -1)
        if self.num_classes:
            logits = tap("classifier", linear(x, params["classifier.weight"], params["classifier.bias"]))
            return logits, tap.taps
        return x, tap.taps

    # ------------------------------------------------------------- torch load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torchvision DenseNet state dict (convs OIHW→HWIO, the
        classifier linear transposed to (in, out))."""
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
        return f"DenseNet(depth={self.depth}, num_classes={self.num_classes})"
