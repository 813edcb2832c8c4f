"""JAX MobileCLIP-style foundation model (``ClipMobile``).

Covers the reference's ``ClipMobile`` capability (reference:
semanticlens/foundation_models/clip.py:214-247 — a pin of open_clip's
MobileCLIP-S1/S2 @ datacompdr). The image tower is a FastViT/MCi-style
hybrid in its **inference (reparameterized) form**: every RepMixer/
MobileOne branch set fuses into a single conv at deploy time, so the
deployed graph is conv stem → RepMixer stages (depthwise token mixing +
ConvFFN) → attention stage → GAP → projection. The text tower is the
standard CLIP 12-layer transformer (MobileCLIP-S1/S2 use the base text
encoder).

Weight conversion: :func:`load_mobileclip_state_dict` converts torch state
dicts in deployed form (``reparam_conv``) AND raw train form (MobileOne
``rbr_*`` branch sets, RepMixer ``mixer``/``norm`` pairs, conv+BN pairs) by
folding the branches natively (:mod:`.reparam`) — no upstream
``model.reparameterize()`` step needed. Parity of the folding math and of
the full tower conversion is tested against torch mini-models
(tests/foundation_models/test_reparam.py, test_mobileclip.py).
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.foundation_models.base import AbstractVLM
from semanticlens_tpu.foundation_models.clip import (
    TextCfg,
    _to_image_batch,
    _transformer_param_specs,
    clip_encode_text,
)
from semanticlens_tpu.foundation_models.tokenizer import ClipBpeTokenizer, HashTokenizer
from semanticlens_tpu.models.layers import (
    conv2d,
    layer_norm,
    linear,
    scaled_dot_product_attention,
)
from semanticlens_tpu.ops.preprocess import preprocess_images

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class MobileCLIPConfig:
    embed_dim: int = 512
    image_size: int = 256
    depths: tuple = (2, 6, 10, 2)
    dims: tuple = (64, 128, 256, 512)
    mixers: tuple = ("rep", "rep", "rep", "attn")
    attn_heads: int = 8
    text: TextCfg = TextCfg(width=512, heads=8, layers=12)
    # Normalization: MobileCLIP uses plain 0-1 scaling (no mean/std shift).
    mean: tuple = (0.0, 0.0, 0.0)
    std: tuple = (1.0, 1.0, 1.0)


MOBILECLIP_PRESETS = {
    "MobileCLIP-S1": MobileCLIPConfig(depths=(2, 6, 10, 2), dims=(64, 128, 256, 512)),
    "MobileCLIP-S2": MobileCLIPConfig(depths=(4, 12, 24, 4), dims=(80, 160, 320, 640)),
}


# --------------------------------------------------------------------------- #
# Inference-form blocks
# --------------------------------------------------------------------------- #
def _dw_conv(x, w, *, stride=1, padding=1):
    """Depthwise conv: w is (k, k, 1, C) with groups=C."""
    return conv2d(x, w, stride=stride, padding=padding, groups=x.shape[-1])


def _conv_ffn(params, prefix, x):
    """ConvFFN (fused): 7×7 depthwise + 1×1 expand + GELU + 1×1 project."""
    h = _dw_conv(x, params[f"{prefix}.dw.weight"], padding=3) + params[f"{prefix}.dw.bias"].astype(x.dtype)
    h = conv2d(h, params[f"{prefix}.fc1.weight"], params[f"{prefix}.fc1.bias"])
    h = jax.nn.gelu(h, approximate=False)
    h = conv2d(h, params[f"{prefix}.fc2.weight"], params[f"{prefix}.fc2.bias"])
    return x + h


def _rep_mixer_block(params, prefix, x):
    """RepMixer (fused): residual depthwise 3×3 token mixing, then ConvFFN."""
    mixed = _dw_conv(x, params[f"{prefix}.mixer.weight"], padding=1)
    mixed = mixed + params[f"{prefix}.mixer.bias"].astype(x.dtype)
    x = x + mixed
    return _conv_ffn(params, f"{prefix}.ffn", x)


def _attention_block(params, prefix, x, heads):
    """MHSA over flattened tokens + ConvFFN (FastViT attention stage)."""
    b, h_, w_, c = x.shape
    tokens = x.reshape(b, h_ * w_, c)
    normed = layer_norm(tokens, params[f"{prefix}.norm.weight"], params[f"{prefix}.norm.bias"])
    qkv = linear(normed, params[f"{prefix}.attn.qkv.weight"], params[f"{prefix}.attn.qkv.bias"])
    q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    attn = scaled_dot_product_attention(q, k, v, heads)
    attn = linear(attn, params[f"{prefix}.attn.proj.weight"], params[f"{prefix}.attn.proj.bias"])
    x = x + attn.reshape(b, h_, w_, c)
    return _conv_ffn(params, f"{prefix}.ffn", x)


def _downsample(params, prefix, x):
    """Fused patch embed between stages: 7×7 depthwise s2 + 1×1 pointwise."""
    h = _dw_conv(x, params[f"{prefix}.dw.weight"], stride=2, padding=3)
    h = h + params[f"{prefix}.dw.bias"].astype(x.dtype)
    return conv2d(h, params[f"{prefix}.pw.weight"], params[f"{prefix}.pw.bias"])


def mobileclip_encode_image(params, cfg: MobileCLIPConfig, images, *, dtype=jnp.float32):
    """(B, H, W, 3) → (B, embed_dim)."""
    x = images.astype(dtype)
    # Fused stem: /4 resolution.
    x = jax.nn.gelu(
        conv2d(x, params["visual.stem.0.weight"], params["visual.stem.0.bias"], stride=2, padding=1),
        approximate=False,
    )
    x = jax.nn.gelu(
        conv2d(x, params["visual.stem.1.weight"], params["visual.stem.1.bias"], stride=2, padding=1),
        approximate=False,
    )

    for stage, (depth, mixer) in enumerate(zip(cfg.depths, cfg.mixers)):
        if stage > 0:
            x = _downsample(params, f"visual.stage{stage}.downsample", x)
        for b in range(depth):
            prefix = f"visual.stage{stage}.blocks.{b}"
            if mixer == "rep":
                x = _rep_mixer_block(params, prefix, x)
            else:
                x = _attention_block(params, prefix, x, cfg.attn_heads)

    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # GAP
    out = jnp.matmul(
        pooled,
        params["visual.head.proj"].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


# --------------------------------------------------------------------------- #
# Parameter specs / init
# --------------------------------------------------------------------------- #
def _ffn_specs(prefix, c):
    hidden = 4 * c
    return [
        (f"{prefix}.dw.weight", (7, 7, 1, c), "dw"),
        (f"{prefix}.dw.bias", (c,), "zeros"),
        (f"{prefix}.fc1.weight", (1, 1, c, hidden), "conv"),
        (f"{prefix}.fc1.bias", (hidden,), "zeros"),
        (f"{prefix}.fc2.weight", (1, 1, hidden, c), "conv"),
        (f"{prefix}.fc2.bias", (c,), "zeros"),
    ]


def mobileclip_param_specs(cfg: MobileCLIPConfig):
    specs = [
        ("visual.stem.0.weight", (3, 3, 3, cfg.dims[0] // 2), "conv"),
        ("visual.stem.0.bias", (cfg.dims[0] // 2,), "zeros"),
        ("visual.stem.1.weight", (3, 3, cfg.dims[0] // 2, cfg.dims[0]), "conv"),
        ("visual.stem.1.bias", (cfg.dims[0],), "zeros"),
    ]
    for stage, (depth, mixer) in enumerate(zip(cfg.depths, cfg.mixers)):
        c = cfg.dims[stage]
        if stage > 0:
            specs += [
                (f"visual.stage{stage}.downsample.dw.weight", (7, 7, 1, cfg.dims[stage - 1]), "dw"),
                (f"visual.stage{stage}.downsample.dw.bias", (cfg.dims[stage - 1],), "zeros"),
                (f"visual.stage{stage}.downsample.pw.weight", (1, 1, cfg.dims[stage - 1], c), "conv"),
                (f"visual.stage{stage}.downsample.pw.bias", (c,), "zeros"),
            ]
        for b in range(depth):
            prefix = f"visual.stage{stage}.blocks.{b}"
            if mixer == "rep":
                specs += [
                    (f"{prefix}.mixer.weight", (3, 3, 1, c), "dw"),
                    (f"{prefix}.mixer.bias", (c,), "zeros"),
                ]
            else:
                specs += [
                    (f"{prefix}.norm.weight", (c,), "ones"),
                    (f"{prefix}.norm.bias", (c,), "zeros"),
                    (f"{prefix}.attn.qkv.weight", (c, 3 * c), "attn"),
                    (f"{prefix}.attn.qkv.bias", (3 * c,), "zeros"),
                    (f"{prefix}.attn.proj.weight", (c, c), "proj"),
                    (f"{prefix}.attn.proj.bias", (c,), "zeros"),
                ]
            specs += _ffn_specs(f"{prefix}.ffn", c)
    specs += [("visual.head.proj", (cfg.dims[-1], cfg.embed_dim), "proj")]

    t = cfg.text
    specs += [
        ("token_embedding.weight", (t.vocab_size, t.width), "embed"),
        ("positional_embedding", (t.context_length, t.width), "scaled"),
        ("ln_final.weight", (t.width,), "ones"),
        ("ln_final.bias", (t.width,), "zeros"),
        ("text_projection", (t.width, cfg.embed_dim), "scaled"),
        ("logit_scale", (), "logit_scale"),
    ]
    specs += _transformer_param_specs("transformer", t.layers, t.width)
    return specs


def init_mobileclip_params(rng, cfg: MobileCLIPConfig):
    from semanticlens_tpu.foundation_models.common import init_from_specs

    return init_from_specs(rng, mobileclip_param_specs(cfg))


#: Visual-tower weight-key suffixes worth int8-quantizing: the 1×1
#: pointwise convs (ConvFFN expand/project, stage-downsample projection)
#: and the attention-stage dense pair carry the FLOPs. Depthwise convs
#: (``.dw.weight`` / ``.mixer.weight``) stay float — one input channel per
#: group gives the MXU's int8 path nothing to batch, and they are VPU-bound
#: anyway. Stem convs (raw-pixel statistics) and the GAP head projection
#: stay float, matching the other towers (ops/quant.py policy).
_MOBILECLIP_QUANT_SUFFIXES = (
    ".fc1.weight",
    ".fc2.weight",
    ".attn.qkv.weight",
    ".attn.proj.weight",
    ".downsample.pw.weight",
)


def quantize_mobileclip_params(params, *, include_text: bool = False):
    """Int8-quantize the FastViT tower's pointwise convs + attention denses.

    Same W8A8-dynamic scheme as ``quantize_clip_params`` (ops/quant.py):
    static per-out-channel int8 weights, per-row (dense) / per-sample (conv)
    dynamic activation quantization, int32 MXU accumulation. The hybrid
    tower's depthwise convs and stem stay float (see
    ``_MOBILECLIP_QUANT_SUFFIXES``). ``include_text`` additionally quantizes
    the CLIP-style text transformer blocks.
    """
    from semanticlens_tpu.ops.quant import quantize_params, transformer_dense_match

    def match(key: str) -> bool:
        return key.startswith("visual.") and key.endswith(_MOBILECLIP_QUANT_SUFFIXES)

    params = quantize_params(params, match)
    if include_text:
        params = quantize_params(params, transformer_dense_match("transformer."))
    return params


# --------------------------------------------------------------------------- #
# Checkpoint conversion (raw train-form or deployed)
# --------------------------------------------------------------------------- #
def load_mobileclip_state_dict(cfg: MobileCLIPConfig, state_dict, *, eps: float = 1e-5):
    """Convert a torch MobileCLIP state dict into the fused JAX layout.

    Handles three source forms per conv site, in priority order:

    1. already in this layout (our own exports) — relayout only;
    2. deployed/reparameterized (``<site>.reparam_conv.weight``);
    3. **raw train-form**: MobileOne-style branch sets
       (``rbr_conv.{i}``/``rbr_scale``/``rbr_skip`` conv+BN branches) and
       RepMixer pairs (``mixer``/``norm``), folded with
       :mod:`semanticlens_tpu.foundation_models.reparam` — the
       ``model.reparameterize()`` step the reference relies on upstream
       (reference clip.py:214-247) happens natively here. Plain
       ``<site>.conv.weight`` + ``<site>.bn.*`` pairs fuse too.

    Apple's release files nest the image tower under ``image_encoder.model.``
    — strip/rename outer prefixes to this module grammar before calling (pure
    renaming; the block-level names are the conventions handled here).
    Linear weights transpose (out,in)→(in,out), convs OIHW→HWIO (depthwise
    (C,1,k,k)→(k,k,1,C)); biases produced by folding fill the matching
    ``.bias`` slots.
    """
    from semanticlens_tpu.foundation_models.reparam import (
        fuse_conv_bn,
        fuse_mobileone_block,
        fuse_repmixer,
    )

    sd = {
        k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }

    def fuse_site(prefix: str, hwio_shape):
        k, in_ch, c = hwio_shape[0], hwio_shape[2], hwio_shape[3]
        groups = c if in_ch == 1 else 1
        if prefix.endswith(".mixer"):
            w, b = fuse_repmixer(sd, prefix, channels=c, k=k, eps=eps)
        elif f"{prefix}.conv.weight" in sd and f"{prefix}.bn.weight" in sd:
            w, b = fuse_conv_bn(
                sd[f"{prefix}.conv.weight"],
                sd[f"{prefix}.bn.weight"],
                sd[f"{prefix}.bn.bias"],
                sd[f"{prefix}.bn.running_mean"],
                sd[f"{prefix}.bn.running_var"],
                bias=sd.get(f"{prefix}.conv.bias"),
                eps=eps,
            )
        else:
            w, b = fuse_mobileone_block(sd, prefix, channels=c, groups=groups, k=k, eps=eps)
        sd[f"{prefix}.weight"] = w  # OIHW; relayout happens below
        sd[f"{prefix}.bias"] = b

    out = {}
    for name, shape, _kind in mobileclip_param_specs(cfg):
        if name not in sd and name.endswith(".weight") and len(shape) == 4:
            fuse_site(name[: -len(".weight")], shape)
        if name not in sd:
            raise KeyError(f"checkpoint provides no source for '{name}'")
        arr = np.asarray(sd[name], np.float64)
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO (dw: (C,1,k,k) → (k,k,1,C))
        elif name.endswith("weight") and arr.ndim == 2 and "embedding" not in name:
            arr = arr.T
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
        out[name] = jnp.asarray(arr, jnp.float32)
    return out


class ClipMobile(AbstractVLM):
    """MobileCLIP foundation model (reference API: clip.py:214-247).

    Parameters
    ----------
    version : "s1" or "s2".
    params / bpe_path / dtype / mesh : as in
        :class:`~semanticlens_tpu.foundation_models.clip.OpenClip`.
    """

    URLs = dict(s1="MobileCLIP-S1", s2="MobileCLIP-S2")

    def __init__(
        self,
        version: str = "s1",
        *,
        params=None,
        checkpoint=None,
        bpe_path=None,
        dtype=jnp.bfloat16,
        mesh=None,
        seed: int = 0,
        quantize: str | None = None,
        **kwargs,
    ):
        if version not in self.URLs:
            raise ValueError(f"Unknown MobileCLIP version '{version}'; expected {sorted(self.URLs)}")
        self.url = self.URLs[version]
        self.cfg = MOBILECLIP_PRESETS[self.url]
        self.dtype = dtype
        self.mesh = mesh
        self.name = f"ClipMobile({self.url})"

        if params is not None:
            self.params = params
        elif checkpoint is not None:
            self.params = load_mobileclip_state_dict(self.cfg, checkpoint)
        else:
            logger.warning("No weights provided for %s — using random init.", self.url)
            self.params = init_mobileclip_params(jax.random.PRNGKey(seed), self.cfg)

        # Opt-in int8 inference for the image tower (docs/PERF_NOTES.md).
        # Applied after loading/reparam folding — quantization is the LAST
        # transform so branch-fusion arithmetic stays float-exact.
        self.quantize = quantize
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"Unsupported quantize={quantize!r}; only 'int8'")
            self.params = quantize_mobileclip_params(self.params)
            # Concept-DB caches key on fm.name (lens.py): segregate from the
            # float twin's caches.
            self.name = f"{self.name}-int8"

        if bpe_path is None:
            from semanticlens_tpu.foundation_models.assets import find_clip_bpe

            bpe_path = find_clip_bpe()
        if bpe_path is not None:
            self.tokenizer = ClipBpeTokenizer(bpe_path, self.cfg.text.context_length)
        else:
            self.tokenizer = HashTokenizer(self.cfg.text.vocab_size, self.cfg.text.context_length)

        # Reuse the CLIP text tower (MobileCLIP S1/S2 = base text encoder);
        # quick_gelu=False (MobileCLIP trains with standard GELU).
        text_cfg = _TextOnly(self.cfg)

        @functools.partial(jax.jit)
        def _encode_image(params, images):
            return mobileclip_encode_image(params, self.cfg, images, dtype=self.dtype)

        @functools.partial(jax.jit)
        def _encode_text(params, tokens):
            return clip_encode_text(params, text_cfg, tokens, dtype=self.dtype)

        self._encode_image = _encode_image
        self._encode_text = _encode_text

    @property
    def context_length(self):
        return self.cfg.text.context_length

    @property
    def embed_dim(self):
        return self.cfg.embed_dim

    def __repr__(self):
        return f"{self.__class__.__name__}(url='{self.url}')"

    def preprocess(self, img):
        arr = _to_image_batch(img, target_size=self.cfg.image_size)
        return preprocess_images(
            jnp.asarray(arr),
            size=self.cfg.image_size,
            crop=self.cfg.image_size,
            mean=self.cfg.mean,
            std=self.cfg.std,
        )

    def encode_image(self, img):
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            img = jax.device_put(img, NamedSharding(self.mesh, P("data")))
        return self._encode_image(self.params, img)

    def tokenize(self, txt, context_length=None):
        return jnp.asarray(self.tokenizer(txt, context_length or self.context_length))

    def encode_text(self, text_input):
        return self._encode_text(self.params, jnp.asarray(text_input))


class _TextOnly:
    """Adapter giving clip_encode_text the (text, quick_gelu) view it needs."""

    def __init__(self, cfg: MobileCLIPConfig):
        self.text = cfg.text
        self.quick_gelu = False
