"""Int8 weight/activation quantization for the pipeline's hot matmuls/convs.

The v5e MXU executes int8×int8→int32 at 2× its bf16 FLOP rate (394 vs 197
TOPS). Both fused-pipeline towers bound the sustained rate (the ViT encode
core measures 9.5k imgs/s and the conv tower 11.1k at batch 128,
docs/PERF_NOTES.md "Batch-size cliff decomposition"). This module gives the
foundation-model towers (``OpenClip``/``SigLipV2`` dense stacks) AND the
subject-model Collect tower (``ResNet`` stage convs, via :func:`int8_conv`)
an OPT-IN int8 inference path the TPU-native way:

- **weights**: static symmetric per-output-channel int8 (scale = row
  absmax / 127), quantized once at model construction;
- **activations**: dynamic symmetric per-row int8, quantized inside the
  program right before each matmul (amax → scale → round), so XLA fuses the
  quantize into the preceding elementwise chain and the matmul runs on the
  int8 MXU path via ``lax.dot_general(..., preferred_element_type=int32)``;
- **everything else** (LayerNorms, attention softmax, residual adds, the
  final projection) stays in the tower's float dtype — the scheme is the
  W8A8-dynamic recipe of LLM.int8()/SmoothQuant lineage, without outlier
  splitting (CLIP/SigLIP-scale towers don't need it; the parity tests pin
  cosine ≥ 0.995 against the float tower).

This is a beyond-reference capability: the reference's Embed stage
(reference semanticlens/foundation_models/clip.py:96-118) runs torch fp32/
fp16 only. Quantization changes embeddings within quantization noise, so it
is NEVER enabled by default; concept-DB cache parity with the reference is
only claimed for float towers.

The ``QuantizedTensor`` pytree is understood by ``models.layers.linear`` —
any model whose dense layers route through it (all transformer families
here) can carry quantized weights with zero changes to its forward code.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class QuantizedTensor(NamedTuple):
    """A (in, out) weight stored as int8 with per-out-channel scales.

    Registered as a pytree via NamedTuple: flows through jit/scan/shard_map
    and donation like any other params-dict leaf.
    """

    q: jax.Array  # (in, out) int8
    scale: jax.Array  # (out,) float32

    @property
    def shape(self):
        return self.q.shape

    @property
    def in_features(self) -> int:
        return self.q.shape[0]

    @property
    def out_features(self) -> int:
        return self.q.shape[1]


def quantize_weight(w: jax.Array) -> QuantizedTensor:
    """Float weight → symmetric per-out-channel int8.

    Works for rank-2 ``(in, out)`` denses and rank-4 HWIO convs alike — the
    OUT channel is the LAST axis in both layouts, so the scale reduces over
    every other axis: scale[o] = absmax(w[..., o]) / 127. Zero channels get
    scale 1 to avoid 0/0 (their quantized values are all-zero anyway).
    """
    w32 = jnp.asarray(w).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=tuple(range(w32.ndim - 1)))
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return QuantizedTensor(q=q, scale=scale)


def dequantize(qt: QuantizedTensor) -> jax.Array:
    """int8 weight back to float32 — the LRP/attribution fallback path.
    The (out,) scale broadcasts over the last axis of any-rank ``q``."""
    return qt.q.astype(jnp.float32) * qt.scale


def col_slice(w, start: int, stop: int):
    """Column-slice a weight that may be quantized.

    Per-out-channel scales make column slicing exact — used by
    ``multi_head_attention`` to split fused in-proj weights into Q/K/V.
    """
    if isinstance(w, QuantizedTensor):
        return QuantizedTensor(q=w.q[:, start:stop], scale=w.scale[start:stop])
    return w[:, start:stop]


def int8_matmul(x: jax.Array, qt: QuantizedTensor) -> jax.Array:
    """(..., in) float @ QuantizedTensor → (..., out) in x.dtype.

    Activations are quantized dynamically per row (symmetric, absmax/127) in
    f32, the product accumulates in int32 on the MXU, and the two scales are
    applied to the int32 accumulator. All-zero rows get scale 1 (their
    quantized row is zero, so the result is exact).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    x_scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q,
        qt.q,
        dimension_numbers=(((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * qt.scale
    return out.astype(x.dtype)


def int8_conv(x: jax.Array, qt: QuantizedTensor, *, stride=(1, 1), padding=((0, 0), (0, 0)), groups: int = 1) -> jax.Array:
    """NHWC float ``x`` convolved with an HWIO :class:`QuantizedTensor`.

    Activations quantize dynamically PER SAMPLE (symmetric absmax over
    H·W·C): a conv output sums many spatial positions of one sample, so the
    only activation scale that factors exactly out of the convolution is a
    per-sample scalar — per-position scales would not commute with the sum
    over the receptive field. Zero padding is exact in the symmetric int8
    domain. The product accumulates in int32 on the MXU's 2×-rate int8 path;
    both scales apply to the accumulator. Returns ``x.dtype``.
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=(1, 2, 3), keepdims=True)
    x_scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        x_q,
        qt.q,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * qt.scale
    return out.astype(x.dtype)


def quantize_params(params: dict, match: Callable[[str], bool]) -> dict:
    """Return a params dict with every float weight whose key satisfies
    ``match`` replaced by a :class:`QuantizedTensor`.

    Only rank-2 (in, out) dense and rank-4 HWIO conv weights are eligible;
    matching anything else raises — silent shape coercion would corrupt a
    tower.
    """
    out = {}
    for key, value in params.items():
        if match(key) and not isinstance(value, QuantizedTensor):
            arr = jnp.asarray(value)
            if arr.ndim not in (2, 4):
                raise ValueError(
                    f"quantize_params matched {key!r} with rank {arr.ndim}; only "
                    "rank-2 (in, out) dense and rank-4 HWIO conv weights can be "
                    "int8-quantized"
                )
            out[key] = quantize_weight(arr)
        else:
            out[key] = value
    return out


#: Key suffixes of the transformer dense weights worth quantizing — the
#: QKV/out projections and the MLP pair carry >95% of a ViT/text tower's
#: FLOPs. LayerNorm params, biases, embeddings, convs and the final
#: projection stay float.
TRANSFORMER_DENSE_SUFFIXES = (
    ".attn.in_proj_weight",
    ".attn.out_proj.weight",
    ".mlp.c_fc.weight",
    ".mlp.c_proj.weight",
)


def transformer_dense_match(prefix: str = "") -> Callable[[str], bool]:
    """Predicate selecting the transformer matmul weights under ``prefix``."""

    def match(key: str) -> bool:
        return key.startswith(prefix) and key.endswith(TRANSFORMER_DENSE_SUFFIXES)

    return match
