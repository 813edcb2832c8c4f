"""Functional NN primitives in channels-last (NHWC) layout.

These are the building blocks for subject models (ResNet, ViT) and the JAX
CLIP towers. Everything is a pure function of a flat parameter dict whose keys
follow torch naming (``conv1.weight`` …), so importing torchvision /
open_clip checkpoints is a mechanical relayout (OIHW→HWIO, linear transpose)
rather than a renaming exercise.

Matmuls/convs run in the input dtype (bf16 on TPU via the caller's dtype
policy) with float32 accumulation — the MXU-native regime.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.ops.quant import (
    QuantizedTensor,
    col_slice,
    dequantize,
    int8_conv,
    int8_matmul,
)

# --------------------------------------------------------------------------- #
# LRP (layer-wise relevance propagation) context
#
# The relevance subsystem re-traces model.apply with a composite active; the
# linear primitives below then attach modified-backward rules (ε / z⁺ / flat)
# via jax.custom_vjp while the FORWARD stays bit-identical. This replaces the
# reference's zennit composites (reference relevance_based.py:19 —
# EpsilonPlusFlat) with JAX-native custom VJPs.
# --------------------------------------------------------------------------- #
_LRP = threading.local()


@contextmanager
def lrp_composite(name: str = "epsilon_plus_flat", epsilon: float = 1e-6):
    """Activate an LRP composite for every layer traced inside the context.

    Composites:
    - ``"epsilon_plus_flat"`` (zennit's EpsilonPlusFlat analogue): first conv
      → flat rule, other convs → z⁺ rule, dense/affine → ε rule.
    - ``"epsilon"``: ε rule everywhere.
    - ``"gradient"``: plain gradient (no modified backward).

    Both non-gradient composites also carry the transformer-grade rules
    (Ali et al. 2022): detached-denominator LayerNorm, CP-LRP attention
    (softmax probs as constants, relevance via the value path), GELU
    pass-through, and proportional residual splitting — see the rule table
    in docs/architecture.md.
    """
    _LRP.composite = name
    _LRP.epsilon = epsilon
    _LRP.n_linear_seen = 0
    try:
        yield
    finally:
        _LRP.composite = None


def _lrp_active():
    return getattr(_LRP, "composite", None) not in (None, "gradient")


def _next_rule(kind: str) -> tuple[str, float]:
    """Pick the rule for the next traced linear op under the composite."""
    comp = _LRP.composite
    eps = _LRP.epsilon
    idx = _LRP.n_linear_seen
    _LRP.n_linear_seen += 1
    if comp == "epsilon":
        return "epsilon", eps
    # epsilon_plus_flat
    if idx == 0:
        return "flat", eps
    if kind == "conv":
        return "zplus", eps
    return "epsilon", eps


def _lrp_wrap(true_fwd, x, rule: str, eps: float, plus_fwd=None, flat_fwd=None):
    """Attach an LRP backward to a linear(ish) forward.

    ``true_fwd`` computes the real output (used forward); the backward
    redistributes incoming relevance R via the chosen rule:

    - ε:     R_x = x ⊙ fᵀ(R / (f(x) + ε·sign(f(x))))
    - z⁺:    R_x = x ⊙ f₊ᵀ(R / (f₊(x) + ε))    (f₊ = positive weights only)
    - flat:  R_x = f₁ᵀ(R / (f₁(1) + ε))         (f₁ = unit weights, unit input)
    """

    @jax.custom_vjp
    def op(x):
        return true_fwd(x)

    def fwd(x):
        return true_fwd(x), x

    def bwd(x, R):
        if rule == "zplus":
            f = plus_fwd
            z = f(x)
            s = R / (z + eps)
            _, vjp = jax.vjp(f, x)
            (c,) = vjp(s)
            return (x * c,)
        if rule == "flat":
            f = flat_fwd
            ones = jnp.ones_like(x)
            z = f(ones)
            s = R / (z + eps)
            _, vjp = jax.vjp(f, ones)
            (c,) = vjp(s)
            return (c,)
        # epsilon
        z = true_fwd(x)
        s = R / (z + eps * jnp.sign(z) + jnp.where(z == 0, eps, 0.0))
        _, vjp = jax.vjp(true_fwd, x)
        (c,) = vjp(s)
        return (x * c,)

    op.defvjp(fwd, bwd)
    return op(x)


def _lrp_passthrough(fn, x):
    """Identity-relevance activation (zennit's ``Pass`` rule).

    Elementwise nonlinearities between two ε-wrapped linears must hand
    relevance through UNCHANGED — autograd's ``fn'(x)·R`` is the gradient
    semantics, not LRP semantics, and silently de-conserves relevance for any
    activation whose derivative isn't {0, 1} (GELU, sigmoid…). ReLU needs no
    wrap: its mask only zeroes coordinates whose relevance is already zero
    under ε/z⁺ (zero post-activation ⇒ zero x⊙c).
    """

    @jax.custom_vjp
    def op(xx):
        return fn(xx)

    def fwd(xx):
        return fn(xx), None

    def bwd(_, R):
        return (R,)

    op.defvjp(fwd, bwd)
    return op(x)


def residual_add(x, h):
    """``x + h`` whose LRP backward SPLITS relevance proportionally.

    A bare ``+`` duplicates the cotangent into both branches — under LRP
    that double-counts: total input relevance becomes 2× the output
    relevance per residual join. Under a composite this applies the
    signed-proportional split (zennit's canonical Sum/Norm handling):
    R_x = R·x/(x+h), R_h = R·h/(x+h), stabilized like the ε rule.
    Outside a composite it is exactly ``x + h``.
    """
    if not _lrp_active():
        return x + h
    eps = _LRP.epsilon

    @jax.custom_vjp
    def op(a, b):
        return a + b

    def fwd(a, b):
        return a + b, (a, b)

    def bwd(res, R):
        a, b = res
        z = a + b
        denom = z + eps * jnp.sign(z) + jnp.where(z == 0, eps, 0.0)
        share = R / denom
        return (a * share, b * share)

    op.defvjp(fwd, bwd)
    return op(x, h)


def conv2d(x, weight, bias=None, *, stride=1, padding=0, groups=1):
    """2-D convolution, NHWC input, HWIO weight, torch-style int padding.

    Accepts an int8 :class:`~semanticlens_tpu.ops.quant.QuantizedTensor`
    weight: the convolution then runs on the MXU's 2×-rate int8 path with
    dynamic per-sample activation quantization (ops/quant.py). Under an
    active LRP composite the weight is dequantized and the float rule set
    applies — attribution numerics never see quantization rounding.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))

    if isinstance(weight, QuantizedTensor):
        if _lrp_active():
            weight = dequantize(weight)
        else:
            out = int8_conv(x, weight, stride=stride, padding=padding, groups=groups)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

    def _conv(x, w):
        # Precision policy: the input dtype selects the MXU regime (cast x to
        # bf16 for speed); HIGHEST stops the backend from silently downcasting
        # f32 inputs to bf16. The explicit f32 output dtype applies ONLY to
        # f32 operands: for bf16 operands the MXU accumulates in f32 anyway
        # (we round back to bf16 immediately), and a widened output dtype
        # makes the primitive non-transposable — conv's transpose rule feeds
        # the f32 cotangent and the bf16 weight into one conv, which lax
        # rejects, killing every gradient/LRP pass through a bf16 model.
        out = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=stride,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
        ).astype(x.dtype)
        return out

    if _lrp_active():
        rule, eps = _next_rule("conv")
        b = 0.0 if bias is None else bias.astype(x.dtype)
        return _lrp_wrap(
            lambda xx: _conv(xx, weight) + b,
            x,
            rule,
            eps,
            plus_fwd=lambda xx: _conv(xx, jnp.maximum(weight, 0.0)),
            flat_fwd=lambda xx: _conv(xx, jnp.ones_like(weight)),
        )

    out = _conv(x, weight)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def batch_norm(x, weight, bias, running_mean, running_var, *, eps=1e-5):
    """Inference-mode batch norm over the channel (last) axis."""
    inv = jax.lax.rsqrt(running_var.astype(jnp.float32) + eps)
    scale = (weight.astype(jnp.float32) * inv).astype(x.dtype)
    shift = (
        bias.astype(jnp.float32) - running_mean.astype(jnp.float32) * weight.astype(jnp.float32) * inv
    ).astype(x.dtype)
    if _lrp_active():
        # Affine layer: ε rule (BN is canonically merged with the adjacent
        # conv; a separate ε application is equivalent for small ε).
        eps_r = _LRP.epsilon
        return _lrp_wrap(
            lambda xx: xx * scale + shift,
            x,
            "epsilon",
            eps_r,
        )
    return x * scale + shift


def linear(x, weight, bias=None):
    """Dense layer; ``weight`` is (in, out) — torch (out, in) is transposed at load.

    Accepts an int8 :class:`~semanticlens_tpu.ops.quant.QuantizedTensor`
    weight: the matmul then runs on the MXU's 2×-rate int8 path with dynamic
    per-row activation quantization (ops/quant.py). Under an active LRP
    composite the weight is dequantized and the float rule set applies —
    attribution numerics never see quantization rounding.
    """
    if isinstance(weight, QuantizedTensor):
        if _lrp_active():
            weight = dequantize(weight)
        else:
            out = int8_matmul(x, weight)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return out

    def _dense(xx, w):
        return jnp.matmul(
            xx,
            w.astype(xx.dtype),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).astype(xx.dtype)

    if _lrp_active():
        rule, eps = _next_rule("linear")
        b = 0.0 if bias is None else bias.astype(x.dtype)
        return _lrp_wrap(
            lambda xx: _dense(xx, weight) + b,
            x,
            rule,
            eps,
            plus_fwd=lambda xx: _dense(xx, jnp.maximum(weight, 0.0)),
            flat_fwd=lambda xx: _dense(xx, jnp.ones_like(weight)),
        )

    out = _dense(x, weight)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _ceil_extra_pad(size: int, window: int, stride: int, padding: int) -> int:
    """Extra right/bottom -inf padding reproducing torch ``ceil_mode=True``.

    torch: output = ceil((size + 2p - k)/s) + 1, minus one if the last
    window would start entirely inside the right padding
    (``(out-1)*s >= size + p``).
    """
    out = -((size + 2 * padding - window) // -stride) + 1
    if (out - 1) * stride >= size + padding:
        out -= 1
    return max(0, (out - 1) * stride + window - (size + 2 * padding))


def max_pool(x, *, window=3, stride=2, padding=1, ceil_mode=False):
    """Max pooling, NHWC, torch-style int padding (optionally ceil_mode)."""
    eh = _ceil_extra_pad(x.shape[1], window, stride, padding) if ceil_mode else 0
    ew = _ceil_extra_pad(x.shape[2], window, stride, padding) if ceil_mode else 0
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding + eh), (padding, padding + ew), (0, 0)),
    )


def avg_pool(x, *, window=2, stride=2, padding=0):
    """Average pooling, NHWC."""
    summed = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (summed / (window * window)).astype(x.dtype)


def global_avg_pool(x):
    """(B, H, W, C) → (B, 1, 1, C) adaptive average pool to 1×1."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def layer_norm(x, weight, bias, *, eps=1e-5):
    """LayerNorm over the last axis, computed in float32.

    Under an LRP composite this carries the **detached-denominator rule**
    (Ali et al. 2022, "XAI for Transformers"): 1/√(var+eps) is treated as a
    constant, which makes LN a linear centering+scaling map, and relevance
    redistributes through it with the ε rule. Without the detachment the
    backward is the raw LN gradient — round-2's silent degradation.
    """
    xf = x.astype(jnp.float32)
    if _lrp_active():
        var = jnp.var(xf, axis=-1, keepdims=True)
        inv = jax.lax.stop_gradient(jax.lax.rsqrt(var + eps))
        w32 = weight.astype(jnp.float32)
        b32 = bias.astype(jnp.float32)
        eps_r = _LRP.epsilon

        def f(xx):
            xxf = xx.astype(jnp.float32)
            centered = xxf - jnp.mean(xxf, axis=-1, keepdims=True)
            return (centered * inv * w32 + b32).astype(x.dtype)

        return _lrp_wrap(f, x, "epsilon", eps_r)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def rms_norm(x, weight, *, eps=1e-6):
    """RMSNorm (Zhang & Sennrich 2019) over the last axis, float32 compute:
    ``x · rsqrt(mean(x²) + eps) · weight`` — HF ``LlamaRMSNorm`` semantics.
    (HF casts to the input dtype before the weight multiply; in float32 the
    two orders are identical, and in bf16 they differ below resolution.)

    Under an LRP composite this carries the same **detached-denominator
    rule** as :func:`layer_norm` (Ali et al. 2022): ``rsqrt(mean(x²)+eps)``
    is treated as a constant, which makes the map a pure per-sample scaling,
    and relevance redistributes through it with the ε rule. RMSNorm has no
    centering and no bias, so — unlike LayerNorm — the detached map is
    exactly diagonal and conservation is per-coordinate."""
    xf = x.astype(jnp.float32)
    w32 = weight.astype(jnp.float32)
    if _lrp_active():
        inv = jax.lax.stop_gradient(
            jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps))
        return _lrp_wrap(
            lambda xx: (xx.astype(jnp.float32) * inv * w32).astype(x.dtype),
            x, "epsilon", _LRP.epsilon)
    inv = jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (xf * inv * w32).astype(x.dtype)


def quick_gelu(x):
    """x·sigmoid(1.702x) — OpenAI CLIP's activation. LRP: pass-through."""
    if _lrp_active():
        return _lrp_passthrough(lambda xx: xx * jax.nn.sigmoid(1.702 * xx), x)
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x, *, approximate=False):
    """GELU that hands relevance through unchanged under an LRP composite."""
    if _lrp_active():
        return _lrp_passthrough(lambda xx: jax.nn.gelu(xx, approximate=approximate), x)
    return jax.nn.gelu(x, approximate=approximate)


def silu(x):
    """SiLU that hands relevance through unchanged under an LRP composite
    (same rationale as :func:`gelu` — its derivative isn't {0, 1})."""
    if _lrp_active():
        return _lrp_passthrough(jax.nn.silu, x)
    return jax.nn.silu(x)


def relu6(x):
    """min(max(x, 0), 6) (MobileNet family). LRP: pass-through — unlike
    plain ReLU, the clip at 6 has NONZERO post-activation with zero
    derivative, so the raw gradient mask would wrongly erase relevance
    for every saturated unit."""
    if _lrp_active():
        return _lrp_passthrough(jax.nn.relu6, x)
    return jax.nn.relu6(x)


def hardswish(x):
    """x·relu6(x+3)/6 (torch ``nn.Hardswish``). LRP: pass-through
    (piecewise derivative is not {0, 1})."""
    if _lrp_active():
        return _lrp_passthrough(jax.nn.hard_swish, x)
    return jax.nn.hard_swish(x)


def gate_scale(x, gate):
    """``x * gate`` for data-dependent gates (SE sigmoid scales, attention
    probabilities). LRP: the gate is treated as a CONSTANT (the CP-LRP
    convention, Ali et al. 2022) and the constant-scaled map carries the ε
    rule — relevance stays in the gated tensor, conserving per coordinate;
    none flows into the gate-computing branch. Raw autograd would both
    rescale relevance by the gate AND leak gradient semantics through the
    sigmoid's saturating derivative."""
    if _lrp_active():
        g = jax.lax.stop_gradient(gate)
        return _lrp_wrap(lambda xx: xx * g, x, "epsilon", _LRP.epsilon)
    return x * gate


def channel_scale(x, gamma):
    """Per-channel scaling (ConvNeXt layer scale). LRP: ε rule — autograd's
    γ·R would rescale relevance instead of conserving it per coordinate."""
    if _lrp_active():
        return _lrp_wrap(lambda xx: xx * gamma.astype(xx.dtype), x, "epsilon", _LRP.epsilon)
    return x * gamma.astype(x.dtype)


def multi_head_attention(x, params, prefix, n_heads, *, mask=None, kv=None):
    """Torch-style ``nn.MultiheadAttention`` with fused in-proj weights.

    Params: ``{prefix}.in_proj_weight`` (3D, D) already transposed to (D, 3D),
    ``{prefix}.in_proj_bias`` (3D,), ``{prefix}.out_proj.weight`` (D, D)
    transposed, ``{prefix}.out_proj.bias`` (D,).

    x: (B, T, D) queries; kv: optional (B, S, D) keys/values (defaults to x).
    mask: optional additive (T, S) float mask.
    """
    d_model = x.shape[-1]
    w_in = params[f"{prefix}.in_proj_weight"]
    b_in = params[f"{prefix}.in_proj_bias"]
    kv = x if kv is None else kv

    if kv is x and not _lrp_active():
        # Self-attention: ONE (D, 3D) projection then output-slice — a 3×
        # wider MXU matmul beats three D×D ones, and an int8-quantized
        # in-proj quantizes x once instead of three times. Bypassed under
        # LRP so the composite's per-linear rule stream stays 3-per-MHA.
        qkv = linear(x, w_in, b_in)
        q = qkv[..., :d_model]
        k = qkv[..., d_model : 2 * d_model]
        v = qkv[..., 2 * d_model :]
    else:
        # col_slice keeps fused in-proj weights sliceable when int8-quantized
        # (per-out-channel scales make the column split exact, ops/quant.py).
        q = linear(x, col_slice(w_in, 0, d_model), b_in[:d_model])
        k = linear(kv, col_slice(w_in, d_model, 2 * d_model), b_in[d_model : 2 * d_model])
        v = linear(kv, col_slice(w_in, 2 * d_model, 3 * d_model), b_in[2 * d_model :])

    out = scaled_dot_product_attention(q, k, v, n_heads, mask=mask)
    return linear(out, params[f"{prefix}.out_proj.weight"], params[f"{prefix}.out_proj.bias"])


def scaled_dot_product_attention(q, k, v, n_heads, *, mask=None, n_kv_heads=None,
                                 scale=None, logit_cap=None):
    """Batched MHA core: (B, T, D) q / (B, S, Dkv) k,v → (B, T, D).

    ``scale`` overrides the default ``head_dim**-0.5`` logit scaling (Gemma 2
    scales by ``query_pre_attn_scalar**-0.5`` instead). ``logit_cap`` applies
    tanh soft-capping ``cap·tanh(logits/cap)`` to the scaled logits BEFORE the
    additive mask (the Gemma 2 convention); soft-capped attention is a
    nonlinearity XLA's fused kernel doesn't model, so those layers take the
    explicit einsum→softmax→einsum path and let XLA fuse it.

    Uses XLA's fused attention (``jax.nn.dot_product_attention``) — measured
    1.72× over the explicit matmul→softmax→matmul formulation at ViT shapes
    on v5e (docs/PERF_NOTES.md); output matches within bf16 resolution.
    ``mask`` is an additive float mask (−inf to block), the torch
    ``attn_mask`` convention: (T, S), or (H, T, S) for per-head biases, or
    (B, H, T, S) for fully batched biases (e.g. Swin's relative-position
    bias + shifted-window masks) — lower ranks broadcast from the left.

    ``n_kv_heads`` < ``n_heads`` enables grouped-query attention (GQA,
    Ainslie et al. 2023): k/v carry ``n_kv_heads·head_dim`` channels and kv
    head g serves the g-th group of ``n_heads//n_kv_heads`` consecutive
    query heads — the HF ``repeat_kv`` convention, which is also how the
    fused kernel groups natively (no materialized repeat on the fast path).

    Under an LRP composite this is **CP-LRP** (conservative-propagation
    attention, Ali et al. 2022): the softmax attention matrix is computed
    then treated as a CONSTANT, so the head becomes a linear map over the
    values and relevance redistributes through it with the ε rule; the
    query/key path receives zero relevance. Forward output is unchanged
    (up to fused-kernel rounding).
    """
    b, t, d = q.shape
    s = k.shape[1]
    head_dim = d // n_heads
    kv_heads = n_kv_heads or n_heads

    def split(x, length, heads=n_heads):
        return x.reshape(b, length, heads, head_dim)

    def to_4d(m):
        m = m.astype(jnp.float32)
        while m.ndim < 4:
            m = m[None]
        return m

    def repeat_kv(x):  # (B, S, KV, C) → (B, S, H, C), HF grouping order
        if kv_heads == n_heads:
            return x
        return jnp.repeat(x, n_heads // kv_heads, axis=2)

    if scale is None:
        scale = head_dim**-0.5

    def soft_cap(logits):
        if logit_cap is None:
            return logits
        return jnp.tanh(logits / logit_cap) * logit_cap

    if _lrp_active():
        logits = soft_cap(
            jnp.einsum(
                "bthc,bshc->bhts",
                split(q, t).astype(jnp.float32),
                repeat_kv(split(k, s, kv_heads)).astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
            * scale
        )
        if mask is not None:
            logits = logits + to_4d(mask)
        probs = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
        eps_r = _LRP.epsilon

        def f(vv):
            out = jnp.einsum(
                "bhts,bshc->bthc",
                probs,
                repeat_kv(split(vv, s, kv_heads)).astype(jnp.float32),
                precision=jax.lax.Precision.HIGHEST,
            )
            return out.reshape(b, t, d).astype(vv.dtype)

        return _lrp_wrap(f, v, "epsilon", eps_r)

    bias = None if mask is None else to_4d(mask)
    if logit_cap is not None:
        # HIGHEST matches the LRP path above — on TPU the default matmul
        # precision would let the capped (Gemma 2) forward drift from it.
        logits = soft_cap(
            jnp.einsum("bthc,bshc->bhts", split(q, t).astype(jnp.float32),
                       repeat_kv(split(k, s, kv_heads)).astype(jnp.float32),
                       precision=jax.lax.Precision.HIGHEST)
            * scale)
        if bias is not None:
            logits = logits + bias
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhts,bshc->bthc", probs,
            repeat_kv(split(v, s, kv_heads)).astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST)
        return out.reshape(b, t, d).astype(v.dtype)
    out = jax.nn.dot_product_attention(
        split(q, t), split(k, s, kv_heads), split(v, s, kv_heads), bias=bias,
        scale=scale)
    return out.reshape(b, t, d)


def edge_pad_mask(ids, pad_id: int):
    """(B, T) bool: True on the LEADING and TRAILING runs of ``pad_id``.

    Padding produced by fixed-length batching is always a contiguous edge
    run (left- or right-padded), so only edge runs are treated as padding —
    a genuine mid-text token that happens to equal ``pad_id`` (e.g. token 0
    = ``"!"`` for GPT-2) is never masked.
    """
    pad = ids == pad_id
    lead = jnp.cumprod(pad.astype(jnp.int32), axis=1).astype(bool)
    trail = jnp.flip(
        jnp.cumprod(jnp.flip(pad, axis=1).astype(jnp.int32), axis=1), axis=1
    ).astype(bool)
    return lead | trail


def attn_out_projection(tap, heads_name, proj_name, a, weight, bias, n_heads):
    """Attention out-projection with the virtual per-head components tap.

    The ``…attn.heads`` tap scores each head's residual-stream contribution
    per token: ``‖head h's output × its W_O slice‖`` → (B, T, n_heads).
    Three regimes, selected statically at trace time:

    - tap not requested, no intervention: plain ``linear`` projection — the
      per-head einsum is never built (zero cost in eager AND traced mode).
    - tap requested (collect sweeps): per-head contributions are computed
      for the norms, the forward still takes the fused ``linear`` path, so
      tapped and untapped programs produce bit-identical outputs.
    - intervention active on ``heads_name``: the tap value (the norms) is
      rewritten and the rewrite is CAUSAL — head h's contribution is
      rescaled by ``new_norm / old_norm`` (zero-ablating a head removes its
      contribution; steering a head's score scales it) and the projection
      output is the rescaled sum + bias. A head whose contribution is
      exactly zero stays zero regardless of the rewrite (nothing to scale).

    LRP note: the intervention path's einsum bypasses ``linear``'s LRP rule;
    attribution never runs inside an ``interventions`` context, so the
    composite only ever sees the fused path.
    """
    from semanticlens_tpu.models.base import has_intervention

    live = has_intervention(heads_name)
    if heads_name in tap.requested or live:
        b, t, d = a.shape
        hd = d // n_heads
        w_o = weight.astype(a.dtype)
        per_head = jnp.einsum(
            "bthc,hcd->bthd",
            a.reshape(b, t, n_heads, hd),
            w_o.reshape(n_heads, hd, w_o.shape[-1]),
        )
        old = jnp.linalg.norm(per_head.astype(jnp.float32), axis=-1)  # (B, T, H)
        new = tap(heads_name, old)
        if live:
            scale = jnp.where(old > 0.0, new.astype(jnp.float32) / jnp.maximum(old, 1e-30), 0.0)
            out = (per_head * scale[..., None].astype(per_head.dtype)).sum(axis=2)
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return tap(proj_name, out)
    return tap(proj_name, linear(a, weight, bias))


def bn_param_specs(prefix: str, ch: int, *, ones_kind: str = "bn_w",
                   zeros_kind: str = "zeros") -> list:
    """(name, shape, init-kind) rows for one torch BatchNorm layer.

    Single source of truth for the 4-tensor BN parameter layout
    (weight/bias/running_mean/running_var) that every CNN family's
    ``_param_specs`` emits; the ``*_kind`` tokens parameterize each
    family's ``init`` vocabulary (scale-like vs offset-like tensors).
    """
    return [
        (f"{prefix}.weight", (ch,), ones_kind),
        (f"{prefix}.bias", (ch,), zeros_kind),
        (f"{prefix}.running_mean", (ch,), zeros_kind),
        (f"{prefix}.running_var", (ch,), ones_kind),
    ]


def load_torch_params(param_specs, state_dict) -> dict:
    """Standard torch→JAX checkpoint relayout shared by the CNN/transformer
    families (single source of truth — was copied per family):

    - 4-D SE squeeze/excite 1×1 convs named ``.fc1.``/``.fc2.`` →
      ``(out, in, 1, 1)`` squeezed to ``(in, out)`` linears;
    - other 4-D convs OIHW → HWIO (depthwise/grouped via the same transpose);
    - 2-D tensors with spec kind ``"linear"`` or a ``…weight`` name →
      transposed to (in, out);
    - everything else (biases, norms, bias tables) passes through.

    Derived buffers (``relative_position_index`` …) are simply absent from
    ``param_specs`` and therefore skipped. Shapes are validated against the
    specs; mismatches raise with the offending name.
    """
    import numpy as np  # local: layers.py is otherwise jnp-only

    params = {}
    for name, shape, kind in param_specs:
        value = state_dict[name]
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if arr.ndim == 4 and (".fc1." in name or ".fc2." in name):
            arr = arr[:, :, 0, 0].T  # SE (out, in, 1, 1) → (in, out)
        elif arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)  # OIHW → HWIO
        elif arr.ndim == 2 and (kind == "linear" or name.endswith("weight")):
            arr = arr.T
        if tuple(arr.shape) != tuple(shape):
            raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
        params[name] = jnp.asarray(arr, jnp.float32)
    return params
