"""Functional Llama-style causal LM with named activation taps.

Beyond-reference subject family (the reference dissects vision models only,
reference README.md:4, activation_based.py:41): this extends the text-side
Collect→Embed→Analyze pipeline from GPT-2 to the MODERN decoder recipe —
RMSNorm (pre-norm, no biases), rotary position embeddings, grouped-query
attention, and a SwiGLU gated MLP — the architecture of Llama 2/3, Mistral
(sliding-window attention via ``sliding_window=``), TinyLlama, and Qwen2/2.5
(q/k/v biases via the :class:`Qwen2` subclass). Every MLP channel
(gate/up/act/down), attention projection, and attention head is a
dissectable component.

Module and parameter names follow Hugging Face ``LlamaForCausalLM``
(``model.layers.3.mlp.gate_proj`` …) so user layer names and HF checkpoints
carry over verbatim. HF stores ``nn.Linear`` weights (out, in); the loader
transposes them to this framework's (in, out). ``model.rotary_emb`` (a
buffer-only module) is not a tap: it emits position tables, not
batch-leading activations.

TPU mapping: token embedding is a gather; each block is two MXU matmul
chains (q/k/v + o_proj, gate/up + down) around the shared fused-attention
helper, which handles GQA natively (no materialized ``repeat_kv``). RoPE is
a fixed per-position rotation — elementwise mults XLA fuses into the
projection matmuls. Everything static-shaped — one XLA program per (B, T).

LRP notes: RMSNorm carries the detached-denominator rule; attention is
CP-LRP (see layers.py); the SwiGLU product routes relevance through the
``up_proj`` branch with ``silu(gate)`` treated as a constant gate
(:func:`~semanticlens_tpu.models.layers.gate_scale`, the CP-LRP convention
for multiplicative gates — Achtibat et al. 2024 treat gated-MLP products
the same way). RoPE sits on the query/key path, which receives zero
relevance under CP-LRP, so it needs no rule of its own.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.models.base import SubjectModel, TapCollector
from semanticlens_tpu.models.layers import (
    attn_out_projection,
    edge_pad_mask,
    gate_scale,
    linear,
    residual_add,
    rms_norm,
    scaled_dot_product_attention,
    silu,
)


def _llama3_scaled_inv_freq(inv_freq, rope_scaling: Mapping) -> jnp.ndarray:
    """HF ``rope_type="llama3"`` frequency rescaling (Llama 3.1/3.2).

    Long wavelengths (low frequencies) divide by ``factor``, short ones pass
    through, and a smooth ramp interpolates between the two bands — the HF
    ``_compute_llama3_parameters`` recipe, applied once to the whole
    ``inv_freq`` table (it is position-independent).
    """
    factor = float(rope_scaling["factor"])
    low = float(rope_scaling.get("low_freq_factor", 1.0))
    high = float(rope_scaling.get("high_freq_factor", 4.0))
    orig = float(rope_scaling.get("original_max_position_embeddings", 8192))

    wavelen = 2.0 * math.pi / inv_freq
    smooth = (orig / wavelen - low) / (high - low)
    interp = (1.0 - smooth) / factor * inv_freq + smooth * inv_freq
    out = jnp.where(wavelen > orig / low, inv_freq / factor, interp)
    return jnp.where(wavelen < orig / high, inv_freq, out)


class Llama(SubjectModel):
    """Llama-family causal LM, HF-compatible names, (B, T) int32 tokens.

    Parameters
    ----------
    vocab_size, n_positions, width, depth, heads, kv_heads, intermediate :
        architecture dims (defaults = TinyLlama-1.1B scale divided down is
        NOT assumed — pass explicit dims or use :meth:`from_name`).
    rope_theta : RoPE base frequency (10 000 for Llama 2, 500 000 for 3.x).
    rope_scaling : optional HF ``rope_type="llama3"`` dict
        (``factor``/``low_freq_factor``/``high_freq_factor``/
        ``original_max_position_embeddings``) — Llama 3.1/3.2 checkpoints.
    rms_eps : RMSNorm epsilon (HF ``rms_norm_eps``).
    tie_word_embeddings : when True the lm_head reuses ``embed_tokens``
        (Llama 3.2 1B/3B); no separate ``lm_head.weight`` parameter exists.
    dtype : activation dtype (bfloat16 = MXU-native).
    """

    _LLAMA3_ROPE = {
        "factor": 8.0, "low_freq_factor": 1.0, "high_freq_factor": 4.0,
        "original_max_position_embeddings": 8192,
    }
    # HF zoo: name → ctor kwargs (pinned from the checkpoints' config.json)
    _HF_VARIANTS = {
        "llama-2-7b": dict(
            vocab_size=32000, n_positions=4096, width=4096, depth=32, heads=32,
            kv_heads=32, intermediate=11008, rope_theta=1e4, rms_eps=1e-5),
        "tinyllama-1.1b": dict(
            vocab_size=32000, n_positions=2048, width=2048, depth=22, heads=32,
            kv_heads=4, intermediate=5632, rope_theta=1e4, rms_eps=1e-5),
        "llama-3.2-1b": dict(
            vocab_size=128256, n_positions=131072, width=2048, depth=16, heads=32,
            kv_heads=8, intermediate=8192, rope_theta=5e5, rms_eps=1e-5,
            rope_scaling=_LLAMA3_ROPE, tie_word_embeddings=True),
        "llama-3.2-3b": dict(
            vocab_size=128256, n_positions=131072, width=3072, depth=28, heads=24,
            kv_heads=8, intermediate=8192, rope_theta=5e5, rms_eps=1e-5,
            rope_scaling=_LLAMA3_ROPE, tie_word_embeddings=True),
        "llama-3.1-8b": dict(
            vocab_size=128256, n_positions=131072, width=4096, depth=32, heads=32,
            kv_heads=8, intermediate=14336, rope_theta=5e5, rms_eps=1e-5,
            rope_scaling=_LLAMA3_ROPE),
        "mistral-7b-v0.1": dict(
            vocab_size=32000, n_positions=32768, width=4096, depth=32, heads=32,
            kv_heads=8, intermediate=14336, rope_theta=1e4, rms_eps=1e-5,
            sliding_window=4096),
    }

    def __init__(
        self,
        vocab_size: int,
        n_positions: int,
        width: int,
        depth: int,
        heads: int,
        kv_heads: int | None = None,
        intermediate: int | None = None,
        *,
        head_dim: int | None = None,
        rope_theta: float = 10000.0,
        rope_scaling: Mapping | None = None,
        rms_eps: float = 1e-6,
        tie_word_embeddings: bool = False,
        sliding_window: int | None = None,
        attention_bias: bool = False,
        dtype=jnp.bfloat16,
        pad_id: int | None = None,
    ):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.width = width
        self.depth = depth
        self.heads = heads
        self.kv_heads = kv_heads if kv_heads is not None else heads
        if heads % self.kv_heads:
            raise ValueError(f"heads={heads} not divisible by kv_heads={self.kv_heads}")
        # head_dim may be decoupled from width//heads (Gemma's 256-wide heads);
        # the divisibility requirement only exists when it must be derived.
        if head_dim is None:
            if width % heads:
                raise ValueError(f"width={width} not divisible by heads={heads}")
            head_dim = width // heads
        self.head_dim = head_dim
        self.intermediate = intermediate if intermediate is not None else 4 * width
        self.rope_theta = float(rope_theta)
        self.rope_scaling = dict(rope_scaling) if rope_scaling else None
        self.rms_eps = rms_eps
        self.tie_word_embeddings = tie_word_embeddings
        self.sliding_window = sliding_window
        self.attention_bias = attention_bias
        self.dtype = dtype
        # pad_id: edge-padding token id (None = no pad masking). Same
        # contract as GPT2.pad_id — see models/gpt.py.
        self.pad_id = pad_id
        self.module_names = tuple(self._enumerate_module_names())

    @classmethod
    def from_name(cls, name: str, *, dtype=jnp.bfloat16, pad_id: int | None = None):
        """Build an HF-zoo-sized model (``llama-2-7b`` … ``mistral-7b-v0.1``)."""
        if name not in cls._HF_VARIANTS:
            raise ValueError(f"name must be one of {sorted(cls._HF_VARIANTS)}, got {name!r}")
        return cls(**cls._HF_VARIANTS[name], dtype=dtype, pad_id=pad_id)

    # Per-layer RMSNorm module names + their init kind (subclass knobs:
    # Gemma adds sandwich norms and zero-init (1+w) scales).
    _norm_names = ("input_layernorm", "post_attention_layernorm")
    _norm_init = "ones"

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["model", "model.embed_tokens", "model.layers"]
        for i in range(self.depth):
            p = f"model.layers.{i}"
            names += [p] + [f"{p}.{n}" for n in self._norm_names]
            names += self._block_module_names(p)
        names += ["model.norm", "lm_head"]
        return names

    def _block_module_names(self, p: str) -> list[str]:
        return [
            f"{p}.self_attn",
            f"{p}.self_attn.q_proj",
            f"{p}.self_attn.k_proj",
            f"{p}.self_attn.v_proj",
            f"{p}.self_attn.heads",
            f"{p}.self_attn.o_proj",
            f"{p}.mlp",
            f"{p}.mlp.gate_proj",
            f"{p}.mlp.up_proj",
            f"{p}.mlp.act_fn",
            f"{p}.mlp.down_proj",
        ]

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        w = self.width
        specs = [("model.embed_tokens.weight", (self.vocab_size, w), "embed")]
        for i in range(self.depth):
            p = f"model.layers.{i}"
            specs += [(f"{p}.{n}.weight", (w,), self._norm_init)
                      for n in self._norm_names]
            specs += self._block_param_specs(p)
        specs.append(("model.norm.weight", (w,), self._norm_init))
        if not self.tie_word_embeddings:
            specs.append(("lm_head.weight", (w, self.vocab_size), "linear"))
        return specs

    def _block_param_specs(self, p: str) -> list:
        w, hd = self.width, self.head_dim
        specs = [
            (f"{p}.self_attn.q_proj.weight", (w, self.heads * hd), "linear"),
            (f"{p}.self_attn.k_proj.weight", (w, self.kv_heads * hd), "linear"),
            (f"{p}.self_attn.v_proj.weight", (w, self.kv_heads * hd), "linear"),
            (f"{p}.self_attn.o_proj.weight", (self.heads * hd, w), "linear"),
        ]
        if self.attention_bias:  # Qwen2-style q/k/v biases (o_proj: none)
            specs += [
                (f"{p}.self_attn.q_proj.bias", (self.heads * hd,), "zeros"),
                (f"{p}.self_attn.k_proj.bias", (self.kv_heads * hd,), "zeros"),
                (f"{p}.self_attn.v_proj.bias", (self.kv_heads * hd,), "zeros"),
            ]
        specs += [
            (f"{p}.mlp.gate_proj.weight", (w, self.intermediate), "linear"),
            (f"{p}.mlp.up_proj.weight", (w, self.intermediate), "linear"),
            (f"{p}.mlp.down_proj.weight", (self.intermediate, w), "linear"),
        ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """HF Llama init: N(0, 0.02) weights, unit RMSNorm scales, zero biases."""
        params = {}
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            elif kind == "zeros":
                params[name] = jnp.zeros(shape, jnp.float32)
            else:
                params[name] = jax.random.normal(sub, shape, jnp.float32) * 0.02
        return params

    # ------------------------------------------------------------------ rope
    def _rope_tables(self, t: int):
        """cos/sin tables (T, head_dim), float32, HF half-rotation layout:
        angles for dims [0, hd/2) duplicated into [hd/2, hd)."""
        hd = self.head_dim
        inv_freq = 1.0 / (
            self.rope_theta ** (jnp.arange(0, hd, 2, dtype=jnp.float32) / hd))
        if self.rope_scaling is not None:
            inv_freq = _llama3_scaled_inv_freq(inv_freq, self.rope_scaling)
        ang = jnp.arange(t, dtype=jnp.float32)[:, None] * inv_freq[None, :]
        emb = jnp.concatenate([ang, ang], axis=-1)
        return jnp.cos(emb), jnp.sin(emb)

    def _apply_rope(self, x, cos, sin):
        """Rotate (B, T, n·head_dim) channels per head; float32 math.

        ``cos``/``sin`` are (T, head_dim) shared tables, or (B, T, head_dim)
        per-row tables (pad-aware position ids)."""
        b, t, d = x.shape
        xh = x.reshape(b, t, d // self.head_dim, self.head_dim).astype(jnp.float32)
        half = self.head_dim // 2
        rot = jnp.concatenate([-xh[..., half:], xh[..., :half]], axis=-1)
        if cos.ndim == 2:
            cos, sin = cos[None], sin[None]
        out = xh * cos[:, :, None, :] + rot * sin[:, :, None, :]
        return out.reshape(b, t, d).astype(x.dtype)

    def _rope(self, ids, t: int):
        """RoPE cos/sin tables, pad-aware and window-independent.

        With ``pad_id`` set, angles index real-token order (cumsum over
        non-pad), so real positions of a left-padded row match the unpadded
        sequence; tables become (B, T, head_dim).
        """
        cos, sin = self._rope_tables(t)
        if self.pad_id is not None:
            is_pad = edge_pad_mask(ids, self.pad_id)
            pos_ids = jnp.clip(jnp.cumsum(~is_pad, axis=1) - 1, 0)
            cos, sin = cos[pos_ids], sin[pos_ids]
        return cos, sin

    def _window_mask(self, ids, t: int, window: int | None):
        """Additive causal mask, pad-aware.

        Mask is (T, T) — 0 on/below diagonal, −inf above; with a sliding
        ``window`` (Mistral; Gemma 2's even layers), position i also drops
        keys more than window−1 behind it (HF keeps 0 ≤ i−j < window). With
        ``pad_id`` set, edge-pad keys are dropped (each position keeps itself
        so softmax rows stay finite) and the mask is then (B, 1, T, T).
        """
        pos_q = jnp.arange(t)[:, None]
        pos_k = jnp.arange(t)[None, :]
        allowed = pos_k <= pos_q
        if window is not None:
            allowed &= pos_q - pos_k < window
        if self.pad_id is not None:
            is_pad = edge_pad_mask(ids, self.pad_id)
            allowed = allowed[None] & (~is_pad[:, None, :] | jnp.eye(t, dtype=bool)[None])
            return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
        return jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)

    # ------------------------------------------------------------ block hooks
    # Subclasses specialize these (Gemma/Gemma2/Phi3); the `apply` skeleton
    # is shared across the whole decoder-LM zoo.
    def _embed(self, tap, params, ids):
        wte = params["model.embed_tokens.weight"].astype(self.dtype)
        return tap("model.embed_tokens", wte[ids])

    def _norm(self, h, params, name):
        return rms_norm(h, params[f"{name}.weight"], eps=self.rms_eps)

    def _norm_tapped(self, tap, params, name, h):
        return tap(name, self._norm(h, params, name))

    def _attn_kwargs(self) -> dict:
        """Extra scaled_dot_product_attention kwargs (Gemma 2: scale/cap)."""
        return {}

    def _mlp_act(self, g):
        return silu(g)

    def _layer_window(self, i: int) -> int | None:
        return self.sliding_window

    def _qkv(self, tap, params, p, n1):
        """Project to (q, k, v) — HF module-output taps, pre-RoPE."""
        def attn_bias(which):
            return params.get(f"{p}.self_attn.{which}.bias") if self.attention_bias else None

        q = tap(f"{p}.self_attn.q_proj", linear(
            n1, params[f"{p}.self_attn.q_proj.weight"], attn_bias("q_proj")))
        k = tap(f"{p}.self_attn.k_proj", linear(
            n1, params[f"{p}.self_attn.k_proj.weight"], attn_bias("k_proj")))
        v = tap(f"{p}.self_attn.v_proj", linear(
            n1, params[f"{p}.self_attn.v_proj.weight"], attn_bias("v_proj")))
        return q, k, v

    def _attention(self, tap, params, p, n1, mask, cos, sin):
        q, k, v = self._qkv(tap, params, p, n1)
        q = self._apply_rope(q, cos, sin)
        k = self._apply_rope(k, cos, sin)
        a = scaled_dot_product_attention(
            q, k, v, self.heads, mask=mask, n_kv_heads=self.kv_heads,
            **self._attn_kwargs())
        # virtual per-HEAD components "{p}.self_attn.heads": ‖head h's
        # residual-stream contribution‖ per token — same contract as
        # GPT2's "…attn.heads" tap; interventions rescale each head's
        # contribution (layers.attn_out_projection).
        a = attn_out_projection(
            tap, f"{p}.self_attn.heads", f"{p}.self_attn.o_proj", a,
            params[f"{p}.self_attn.o_proj.weight"], None, self.heads)
        return tap(f"{p}.self_attn", a)

    def _post_attention(self, tap, params, p, h, a):
        """Pre-norm residual: attention output adds straight back."""
        return residual_add(h, a)

    def _mlp(self, tap, params, p, n2):
        g = tap(f"{p}.mlp.gate_proj", linear(n2, params[f"{p}.mlp.gate_proj.weight"]))
        u = tap(f"{p}.mlp.up_proj", linear(n2, params[f"{p}.mlp.up_proj.weight"]))
        act = tap(f"{p}.mlp.act_fn", self._mlp_act(g))
        # gated product: under LRP the gate activation is a constant and
        # relevance rides the up_proj branch (module docstring)
        m = gate_scale(u, act)
        m = tap(f"{p}.mlp.down_proj", linear(m, params[f"{p}.mlp.down_proj.weight"]))
        return tap(f"{p}.mlp", m)

    def _feed_forward(self, tap, params, p, h):
        n2 = self._norm_tapped(tap, params, f"{p}.post_attention_layernorm", h)
        return residual_add(h, self._mlp(tap, params, p, n2))

    def _cap_logits(self, logits):
        return logits

    # ----------------------------------------------------------------- apply
    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, T) int tokens → (logits (B, T, V), taps). Token taps (B, T, C)."""
        tap = TapCollector(tap_names)
        ids = x.astype(jnp.int32)
        b, t = ids.shape
        if t > self.n_positions:
            raise ValueError(f"sequence length {t} exceeds n_positions {self.n_positions}")

        h = self._embed(tap, params, ids)
        cos, sin = self._rope(ids, t)  # window-independent, computed once
        windows = sorted({self._layer_window(i) for i in range(self.depth)},
                         key=lambda w: (w is None, w))
        masks = {win: self._window_mask(ids, t, win) for win in windows}

        for i in range(self.depth):
            p = f"model.layers.{i}"
            mask = masks[self._layer_window(i)]
            n1 = self._norm_tapped(tap, params, f"{p}.input_layernorm", h)
            a = self._attention(tap, params, p, n1, mask, cos, sin)
            h = self._post_attention(tap, params, p, h, a)
            h = self._feed_forward(tap, params, p, h)
            h = tap(p, h)
        h = tap("model.layers", h)

        h = self._norm_tapped(tap, params, "model.norm", h)
        h = tap("model", h)
        head_w = (params["model.embed_tokens.weight"].astype(self.dtype).T
                  if self.tie_word_embeddings else params["lm_head.weight"])
        logits = tap("lm_head", linear(h, head_w))
        return self._cap_logits(logits), tap.taps

    # ------------------------------------------------------------------ load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert an HF ``LlamaForCausalLM`` state dict: ``nn.Linear``
        weights (out, in) transpose to (in, out); embeddings and norm scales
        copy through; ``model.rotary_emb.inv_freq`` (derived buffer) is
        ignored. With ``tie_word_embeddings`` any ``lm_head.weight`` in the
        dict is likewise ignored — the forward reuses ``embed_tokens``.
        """
        params = {}
        for name, shape, kind in self._param_specs():
            if name not in state_dict:
                raise KeyError(f"{name} missing from state dict")
            value = state_dict[name]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if kind == "linear":
                arr = arr.T
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    def __repr__(self):
        return (
            f"{type(self).__name__}(vocab_size={self.vocab_size}, "
            f"n_positions={self.n_positions}, "
            f"width={self.width}, depth={self.depth}, heads={self.heads}, "
            f"kv_heads={self.kv_heads}, intermediate={self.intermediate}, "
            f"tied={self.tie_word_embeddings})"
        )


class Qwen2(Llama):
    """Qwen2/2.5 causal LM — the Llama recipe plus q/k/v projection biases
    (HF ``Qwen2ForCausalLM``; module/parameter names are identical to
    Llama's, ``o_proj`` and the MLP stay bias-free). ``attention_bias``
    defaults True; everything else — RMSNorm, RoPE, GQA, SwiGLU, taps,
    loader, LRP rules — is inherited unchanged."""

    # HF zoo: name → ctor kwargs (pinned from the checkpoints' config.json)
    _HF_VARIANTS = {
        "qwen2.5-0.5b": dict(
            vocab_size=151936, n_positions=32768, width=896, depth=24, heads=14,
            kv_heads=2, intermediate=4864, rope_theta=1e6, rms_eps=1e-6,
            tie_word_embeddings=True),
        "qwen2.5-1.5b": dict(
            vocab_size=151936, n_positions=32768, width=1536, depth=28, heads=12,
            kv_heads=2, intermediate=8960, rope_theta=1e6, rms_eps=1e-6,
            tie_word_embeddings=True),
        "qwen2.5-7b": dict(
            vocab_size=152064, n_positions=32768, width=3584, depth=28, heads=28,
            kv_heads=4, intermediate=18944, rope_theta=1e6, rms_eps=1e-6),
    }

    def __init__(self, *args, attention_bias: bool = True, **kwargs):
        super().__init__(*args, attention_bias=attention_bias, **kwargs)
