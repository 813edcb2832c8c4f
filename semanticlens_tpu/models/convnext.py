"""Functional timm-style ConvNeXt with named activation taps.

Third subject-model family (after ResNet and ViT): a modern conv
architecture whose blocks mix a depthwise 7×7 conv, channels-last LayerNorm,
an inverted-bottleneck MLP, and layer scale — exercising tap/aggregation
paths that neither BatchNorm ResNets nor token-space ViTs cover. Module and
parameter names follow timm's ``convnext_*`` scheme (``stem.0``,
``stages.2.blocks.5.conv_dw`` …) so user layer names and timm state dicts
carry over; ``naming="torchvision"`` switches the whole surface — module
names, parameter names, checkpoint relayout — to torchvision's graph
(``features.5.2.block.0``, ``classifier.2``, (C,1,1) ``layer_scale``),
matching ``convnext_tiny`` … ``convnext_large`` via :meth:`from_name`. The
reference reaches such models through torch hooks on ``named_modules``
(reference activation_caching.py:266-277).

ConvNeXt is channels-last *natively* (its LayerNorm/MLP act on the channel
axis), which maps directly onto the TPU NHWC layout — no permutes anywhere.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import channel_scale, conv2d, gelu, layer_norm, linear, residual_add

_PRESETS = {
    # name: (depths per stage, dims per stage)
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}

_TV_BLOCK = {
    # timm block-suffix → torchvision CNBlock suffix (block = Sequential:
    # 0 dwconv, 1 permute, 2 LN, 3 fc1, 4 GELU, 5 fc2, 6 permute)
    "conv_dw": "block.0",
    "norm": "block.2",
    "mlp.fc1": "block.3",
    "mlp.fc2": "block.5",
    "mlp": "block",  # Sequential output = fc2 output (permutes are layout-only)
    "gamma": "layer_scale",
}


def _to_torchvision(name: str) -> str:
    """Canonical (timm) module/param name → torchvision's ``convnext_*``
    graph naming: stem = ``features.0``, stage i = ``features.{2i+1}``,
    downsample i = ``features.{2i}``, head = ``classifier`` (0 = LN,
    2 = Linear). Every canonical name has a torchvision equivalent."""
    if name == "stem" or name.startswith("stem."):
        return name.replace("stem", "features.0", 1)
    if name == "stages":
        return "features"
    if name.startswith("stages."):
        parts = name.split(".")
        i = int(parts[1])
        tail = parts[2:]
        if tail and tail[0] == "downsample":
            return ".".join([f"features.{2 * i}"] + tail[1:])
        if tail and tail[0] == "blocks":
            base = f"features.{2 * i + 1}.{tail[1]}"
            rest = tail[2:]
            if not rest:
                return base
            key = ".".join(rest)
            for timm_sfx, tv_sfx in _TV_BLOCK.items():
                if key == timm_sfx or key.startswith(timm_sfx + "."):
                    return f"{base}.{key.replace(timm_sfx, tv_sfx, 1)}"
            raise KeyError(f"no torchvision mapping for block member {key!r}")
        return f"features.{2 * i + 1}"
    if name == "head":
        return "classifier"
    if name.startswith("head.norm"):
        return name.replace("head.norm", "classifier.0", 1)
    if name.startswith("head.fc"):
        return name.replace("head.fc", "classifier.2", 1)
    return name


class ConvNeXt(SubjectModel):
    """ConvNeXt-T/S/B classifier, channels-last, timm-compatible names.

    Parameters
    ----------
    variant : "tiny" | "small" | "base".
    num_classes : classifier width (0 → pooled features, no head).
    dtype : activation dtype (bfloat16 = MXU-native). The depthwise convs
        run on the VPU regardless — ConvNeXt is a capability family, not
        the TPU throughput choice (docs/PERF_NOTES.md on depthwise convs).
    """

    naming = "timm"  # class default: subclasses that bypass __init__ (test
    # mini-models) keep the canonical convention

    def __init__(self, variant: str = "tiny", num_classes: int = 1000, dtype=jnp.bfloat16,
                 naming: str = "timm"):
        if variant not in _PRESETS:
            raise ValueError(f"Unknown ConvNeXt variant '{variant}'; expected {sorted(_PRESETS)}")
        if naming not in ("timm", "torchvision"):
            raise ValueError(f"naming must be 'timm' or 'torchvision', got {naming!r}")
        self.variant = variant
        self.depths, self.dims = _PRESETS[variant]
        self.num_classes = num_classes
        self.dtype = dtype
        self.naming = naming
        self.module_names = tuple(self._enumerate_module_names())

    @classmethod
    def from_name(cls, name: str, *, num_classes: int = 1000, dtype=jnp.bfloat16):
        """Build a torchvision-named ConvNeXt from its zoo name
        (``convnext_tiny`` … ``convnext_large``)."""
        variant = name.removeprefix("convnext_")
        if not name.startswith("convnext_") or variant not in _PRESETS:
            raise ValueError(
                f"name must be one of {sorted('convnext_' + v for v in _PRESETS)}, got {name!r}")
        return cls(variant=variant, num_classes=num_classes, dtype=dtype,
                   naming="torchvision")

    def _n(self, name: str) -> str:
        """Translate a canonical (timm) name to the active convention."""
        return name if self.naming == "timm" else _to_torchvision(name)

    # ------------------------------------------------------------------ names
    def _enumerate_module_names(self):
        names = self._enumerate_canonical_names()
        if self.naming == "timm":
            return names
        translated = [_to_torchvision(n) for n in names]
        translated.append("avgpool")  # torchvision-only module (tapped in apply)
        return translated

    def _enumerate_canonical_names(self):
        names = ["stem", "stem.0", "stem.1", "stages"]
        for i, depth in enumerate(self.depths):
            p = f"stages.{i}"
            names.append(p)
            if i > 0:
                names += [f"{p}.downsample", f"{p}.downsample.0", f"{p}.downsample.1"]
            for j in range(depth):
                b = f"{p}.blocks.{j}"
                names += [b, f"{b}.conv_dw", f"{b}.norm", f"{b}.mlp", f"{b}.mlp.fc1", f"{b}.mlp.fc2"]
        names += ["head", "head.norm"]
        if self.num_classes:
            names.append("head.fc")
        return names

    # ------------------------------------------------------------------ init
    def _param_specs(self):
        d0 = self.dims[0]
        specs = [
            ("stem.0.weight", (4, 4, 3, d0), "conv"),
            ("stem.0.bias", (d0,), "zeros"),
            ("stem.1.weight", (d0,), "ones"),
            ("stem.1.bias", (d0,), "zeros"),
        ]
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            p = f"stages.{i}"
            if i > 0:
                prev = self.dims[i - 1]
                specs += [
                    (f"{p}.downsample.0.weight", (prev,), "ones"),
                    (f"{p}.downsample.0.bias", (prev,), "zeros"),
                    (f"{p}.downsample.1.weight", (2, 2, prev, dim), "conv"),
                    (f"{p}.downsample.1.bias", (dim,), "zeros"),
                ]
            for j in range(depth):
                b = f"{p}.blocks.{j}"
                specs += [
                    (f"{b}.conv_dw.weight", (7, 7, 1, dim), "conv"),
                    (f"{b}.conv_dw.bias", (dim,), "zeros"),
                    (f"{b}.norm.weight", (dim,), "ones"),
                    (f"{b}.norm.bias", (dim,), "zeros"),
                    (f"{b}.mlp.fc1.weight", (dim, 4 * dim), "fc"),
                    (f"{b}.mlp.fc1.bias", (4 * dim,), "zeros"),
                    (f"{b}.mlp.fc2.weight", (4 * dim, dim), "fc"),
                    (f"{b}.mlp.fc2.bias", (dim,), "zeros"),
                    (f"{b}.gamma", (dim,), "gamma"),
                ]
        dl = self.dims[-1]
        specs += [("head.norm.weight", (dl,), "ones"), ("head.norm.bias", (dl,), "zeros")]
        if self.num_classes:
            specs += [
                ("head.fc.weight", (dl, self.num_classes), "fc"),
                ("head.fc.bias", (self.num_classes,), "zeros"),
            ]
        if self.naming == "timm":
            return specs
        return [(_to_torchvision(n), shape, kind) for n, shape, kind in specs]

    def init(self, rng) -> dict[str, jax.Array]:
        """Normal(0, 0.02) convs/fcs (untruncated take on timm's
        trunc_normal(0.02) default), 1e-6 layer scale."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            elif kind == "zeros":
                params[name] = jnp.zeros(shape, jnp.float32)
            elif kind == "gamma":
                params[name] = jnp.full(shape, 1e-6, jnp.float32)
            else:  # conv / fc
                params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.02
        return params

    # ------------------------------------------------------------------ apply
    def _ln(self, p_, prefix, x):
        return layer_norm(x, p_(f"{prefix}.weight"), p_(f"{prefix}.bias"), eps=1e-6)

    def _block(self, p_, prefix, x, tap):
        dim = x.shape[-1]
        h = conv2d(
            x, p_(f"{prefix}.conv_dw.weight"), p_(f"{prefix}.conv_dw.bias"),
            padding=3, groups=dim,
        )
        h = tap(f"{prefix}.conv_dw", h)
        h = tap(f"{prefix}.norm", self._ln(p_, f"{prefix}.norm", h))
        h = tap(f"{prefix}.mlp.fc1", linear(h, p_(f"{prefix}.mlp.fc1.weight"), p_(f"{prefix}.mlp.fc1.bias")))
        h = gelu(h, approximate=False)
        h = tap(f"{prefix}.mlp.fc2", linear(h, p_(f"{prefix}.mlp.fc2.weight"), p_(f"{prefix}.mlp.fc2.bias")))
        h = tap(f"{prefix}.mlp", h)
        h = channel_scale(h, p_(f"{prefix}.gamma"))
        out = residual_add(x, h)
        return tap(prefix, out)

    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, H, W, 3) → (logits, taps). Conv taps are NHWC."""
        tapc = TapCollector(tap_names)

        def tap(name, value):
            return tapc(self._n(name), value)

        def p_(key):
            return params[self._n(key)]

        x = x.astype(self.dtype)

        x = tap("stem.0", conv2d(x, p_("stem.0.weight"), p_("stem.0.bias"), stride=4))
        x = tap("stem.1", self._ln(p_, "stem.1", x))
        x = tap("stem", x)

        for i, depth in enumerate(self.depths):
            p = f"stages.{i}"
            if i > 0:
                x = tap(f"{p}.downsample.0", self._ln(p_, f"{p}.downsample.0", x))
                x = tap(
                    f"{p}.downsample.1",
                    conv2d(x, p_(f"{p}.downsample.1.weight"), p_(f"{p}.downsample.1.bias"), stride=2),
                )
                x = tap(f"{p}.downsample", x)
            for j in range(depth):
                x = self._block(p_, f"{p}.blocks.{j}", x, tap)
            x = tap(p, x)
        x = tap("stages", x)

        pooled = jnp.mean(x, axis=(1, 2))
        if self.naming == "torchvision":
            pooled = tapc("avgpool", pooled)  # torchvision pools BEFORE the classifier LN
        pooled = tap("head.norm", self._ln(p_, "head.norm", pooled))
        if self.num_classes:
            logits = tap("head.fc", linear(pooled, p_("head.fc.weight"), p_("head.fc.bias")))
            logits = tap("head", logits)
            return logits, tapc.taps
        pooled = tap("head", pooled)
        return pooled, tapc.taps

    # ------------------------------------------------------------- torch load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert a torch ConvNeXt state dict in the active naming
        convention — timm's ``convnext_*``, or torchvision's (identical
        tensors under ``features.*``/``classifier.*`` names; its
        ``layer_scale`` is stored (C, 1, 1) and squeezes to (C,)).

        Regular convs relayout OIHW→HWIO; depthwise convs (O, 1, kH, kW)
        with O == channels become HWIO (kH, kW, 1, O); linears transpose.
        """
        params = {}
        for name, shape, _ in self._param_specs():
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if name.endswith("layer_scale"):
                arr = arr.reshape(-1)  # torchvision stores (C, 1, 1)
            elif arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO (dw: (k,k,1,C))
            elif name.endswith("weight") and arr.ndim == 2:
                arr = arr.T
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    def __repr__(self):
        return (f"ConvNeXt(variant='{self.variant}', num_classes={self.num_classes}, "
                f"naming={self.naming!r})")
