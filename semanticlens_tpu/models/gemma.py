"""Functional Gemma / Gemma 2 causal LMs with named activation taps.

Beyond-reference subject family (the reference dissects vision models only,
reference README.md:4, activation_based.py:41): Google's open-LM recipe,
which differs from Llama's in every place an interpretability pipeline
touches — so it earns its own subject class rather than a config knob:

- **RMSNorm with a (1 + w) scale** (zero-initialised weights; HF
  ``GemmaRMSNorm``) — implemented by shifting the stored weight at call
  time, so checkpoints load verbatim and the detached-denominator LRP rule
  (`layers.rms_norm`) applies unchanged.
- **Embedding scaling**: hidden states enter the stack multiplied by
  ``sqrt(width)``.
- **GeGLU MLP**: ``down(gelu_tanh(gate(x)) · up(x))`` — same gated product
  as SwiGLU, different gate nonlinearity, same CP-LRP constant-gate rule.
- **Decoupled head_dim** (256 regardless of width/heads — Gemma-7B's q/k/v
  are 3072→4096), and multi-query attention on Gemma-2B (kv_heads=1).
- **Gemma 2 only**: sandwich norms (``pre_feedforward_layernorm`` /
  ``post_feedforward_layernorm``, and ``post_attention_layernorm`` moves to
  the attention OUTPUT before the residual add), tanh logit soft-capping on
  attention scores and final logits, a ``query_pre_attn_scalar`` attention
  scale, and alternating local/global attention (even layers slide a
  4096-token window, odd layers attend globally).

Module and parameter names follow Hugging Face ``GemmaForCausalLM`` /
``Gemma2ForCausalLM`` (``model.layers.3.mlp.gate_proj`` …) so user layer
names and HF checkpoints carry over verbatim; parity vs `transformers` is
pinned in tests/models/test_gemma.py. All the Llama machinery — tap
contract, virtual per-head ``…self_attn.heads`` components, pad-aware
masking, GSPMD tensor-parallel specs, the text Collect/Embed pipeline and
token-level LRP — applies to Gemma subjects unchanged via inheritance.

TPU mapping: identical to Llama (MXU matmul chains around fused attention);
soft-capped Gemma-2 attention takes the explicit softmax path (tanh is a
nonlinearity the fused kernel doesn't model) and XLA fuses it.
"""

from __future__ import annotations

import jax.numpy as jnp

from semanticlens_tpu.models.layers import (
    channel_scale,
    gelu,
    residual_add,
    rms_norm,
)
from semanticlens_tpu.models.llama import Llama


class Gemma(Llama):
    """Gemma-1 causal LM, HF ``GemmaForCausalLM`` names, (B, T) int tokens.

    Accepts the Llama constructor arguments plus ``head_dim`` (decoupled
    from ``width // heads``; defaults to it when omitted). Word embeddings
    are always tied (every Gemma checkpoint ties them).
    """

    # HF zoo: name → ctor kwargs (pinned from the checkpoints' config.json)
    _HF_VARIANTS = {
        "gemma-2b": dict(
            vocab_size=256000, n_positions=8192, width=2048, depth=18, heads=8,
            kv_heads=1, head_dim=256, intermediate=16384, rope_theta=1e4,
            rms_eps=1e-6),
        "gemma-7b": dict(
            vocab_size=256000, n_positions=8192, width=3072, depth=28, heads=16,
            kv_heads=16, head_dim=256, intermediate=24576, rope_theta=1e4,
            rms_eps=1e-6),
    }

    def __init__(self, *args, **kwargs):
        # head_dim (decoupled from width//heads) is handled by Llama.__init__
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(*args, **kwargs)

    # attention-scale / soft-cap hooks (Gemma 2 overrides)
    def _attn_kwargs(self) -> dict:
        return {"scale": self.head_dim**-0.5, "logit_cap": None}

    def _mlp_act(self, g):
        """GeGLU gate: tanh-approximated GELU (HF ``gelu_pytorch_tanh``)."""
        return gelu(g, approximate=True)

    def _norm(self, h, params, name):
        """(1 + w)-scaled RMSNorm — HF GemmaRMSNorm, zero-init weights."""
        return rms_norm(h, params[f"{name}.weight"] + 1.0, eps=self.rms_eps)

    _norm_init = "zeros"

    def _block_param_specs(self, p: str) -> list:
        # No attention_bias variant in the Gemma family.
        w, hd = self.width, self.head_dim
        return [
            (f"{p}.self_attn.q_proj.weight", (w, self.heads * hd), "linear"),
            (f"{p}.self_attn.k_proj.weight", (w, self.kv_heads * hd), "linear"),
            (f"{p}.self_attn.v_proj.weight", (w, self.kv_heads * hd), "linear"),
            (f"{p}.self_attn.o_proj.weight", (self.heads * hd, w), "linear"),
            (f"{p}.mlp.gate_proj.weight", (w, self.intermediate), "linear"),
            (f"{p}.mlp.up_proj.weight", (w, self.intermediate), "linear"),
            (f"{p}.mlp.down_proj.weight", (self.intermediate, w), "linear"),
        ]

    def _embed(self, tap, params, ids):
        # embedding normalizer: sqrt(width) in the activation dtype (HF casts
        # the scalar to hidden_states.dtype before multiplying). channel_scale
        # carries the eps rule so a constant scaling conserves relevance -
        # raw autograd would multiply every token's relevance by sqrt(width).
        normalizer = jnp.asarray(self.width**0.5, self.dtype)
        return channel_scale(super()._embed(tap, params, ids), normalizer)


class Gemma2(Gemma):
    """Gemma 2 — the Gemma recipe plus sandwich norms, tanh soft-capping,
    a ``query_pre_attn_scalar`` attention scale, and alternating
    local(window)/global attention (HF ``Gemma2ForCausalLM``: EVEN layers
    slide, odd layers are global).

    Tap note: ``…post_attention_layernorm`` here normalises the ATTENTION
    OUTPUT (before its residual add) — the HF module of the same name — and
    two new per-layer taps appear: ``…pre_feedforward_layernorm`` and
    ``…post_feedforward_layernorm``. ``lm_head`` taps the projection output
    before the final soft-cap (the HF module boundary); the returned logits
    are capped.
    """

    _norm_names = ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm", "post_feedforward_layernorm")
    # HF zoo: name → ctor kwargs (pinned from the checkpoints' config.json)
    _HF_VARIANTS = {
        "gemma-2-2b": dict(
            vocab_size=256000, n_positions=8192, width=2304, depth=26, heads=8,
            kv_heads=4, head_dim=256, intermediate=9216, rope_theta=1e4,
            rms_eps=1e-6, sliding_window=4096, query_pre_attn_scalar=256.0),
        "gemma-2-9b": dict(
            vocab_size=256000, n_positions=8192, width=3584, depth=42, heads=16,
            kv_heads=8, head_dim=256, intermediate=14336, rope_theta=1e4,
            rms_eps=1e-6, sliding_window=4096, query_pre_attn_scalar=256.0),
        "gemma-2-27b": dict(
            vocab_size=256000, n_positions=8192, width=4608, depth=46, heads=32,
            kv_heads=16, head_dim=128, intermediate=36864, rope_theta=1e4,
            rms_eps=1e-6, sliding_window=4096, query_pre_attn_scalar=144.0),
    }

    def __init__(self, *args, query_pre_attn_scalar: float | None = None,
                 attn_logit_softcapping: float | None = 50.0,
                 final_logit_softcapping: float | None = 30.0, **kwargs):
        super().__init__(*args, **kwargs)
        self.query_pre_attn_scalar = (
            float(query_pre_attn_scalar) if query_pre_attn_scalar is not None
            else float(self.head_dim))
        self.attn_logit_softcapping = attn_logit_softcapping
        self.final_logit_softcapping = final_logit_softcapping

    def _attn_kwargs(self) -> dict:
        return {"scale": self.query_pre_attn_scalar**-0.5,
                "logit_cap": self.attn_logit_softcapping}

    def _layer_window(self, i: int) -> int | None:
        return self.sliding_window if i % 2 == 0 else None

    def _post_attention(self, tap, params, p, h, a):
        """Sandwich norm: normalise the attention output, then residual-add."""
        a = self._norm_tapped(tap, params, f"{p}.post_attention_layernorm", a)
        return residual_add(h, a)

    def _feed_forward(self, tap, params, p, h):
        n2 = self._norm_tapped(tap, params, f"{p}.pre_feedforward_layernorm", h)
        m = self._mlp(tap, params, p, n2)
        m = self._norm_tapped(tap, params, f"{p}.post_feedforward_layernorm", m)
        return residual_add(h, m)

    def _cap_logits(self, logits):
        if self.final_logit_softcapping is None:
            return logits
        cap = jnp.asarray(self.final_logit_softcapping, jnp.float32)
        return (jnp.tanh(logits.astype(jnp.float32) / cap) * cap).astype(logits.dtype)
