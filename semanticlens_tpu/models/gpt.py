"""Functional GPT-2-style causal language model with named activation taps.

Beyond-reference subject family: the reference dissects vision models only
(reference README.md:4, activation_based.py:41), but nothing in the
Collect→Embed→Analyze pipeline is vision-specific — components are named
activations, evidence is top-activating SAMPLES, and the FM joint space
embeds text as readily as images. This family + the text visualizer
(:mod:`semanticlens_tpu.collect.text_based`) extend the audit to
transformer LMs: find what each MLP neuron / attention channel of a
language model encodes, name it with CLIP-Dissect, score its clarity, and
causally validate it — the exact workflow the reference offers for CNNs.

Module and parameter names follow Hugging Face ``GPT2LMHeadModel``
(``transformer.h.3.mlp.c_fc`` …) so user layer names and HF checkpoints
carry over verbatim. HF's ``Conv1D`` stores weights as (in, out) — already
this framework's linear layout, so the checkpoint relayout is a pure
shape-validated copy (no transposes).

TPU mapping: token embedding is a gather; each block is two MXU matmul
chains (packed qkv + out-proj, fc + proj) around the shared fused-attention
helper with an additive causal mask; the tied lm_head is one (B·T, D) ×
(D, V) matmul. Everything static-shaped — one XLA program per (B, T).

Taps yield (B, T, D) token activations for the transformer aggregators.
torch named_modules parity notes: dropout modules are identity at eval and
not listed; ``transformer.wpe`` is recorded broadcast to (B, T, D) so every
tap keeps the batch-leading contract the collect engine requires. One
beyond-torch virtual tap per block, ``…attn.heads`` (B, T, n_heads): the
norm of each head's residual-stream contribution (head output × its W_O
slice), making ATTENTION HEADS first-class dissectable components —
collect their top-engaging prompts, embed, name, score, and causally
ablate/steer them (an intervention on the tap rescales each head's
contribution by new/old norm — layers.attn_out_projection).
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
    gelu,
    layer_norm,
    linear,
    residual_add,
    scaled_dot_product_attention,
)


class GPT2(SubjectModel):
    """GPT-2 causal LM, HF-compatible names, (B, T) int32 token input.

    Parameters
    ----------
    vocab_size, n_positions, width, depth, heads : architecture dims
        (defaults = HF ``gpt2``: 50257 / 1024 / 768 / 12 / 12).
    dtype : activation dtype (bfloat16 = MXU-native).
    pad_id : token id used for edge padding, or None (default). When set,
        leading/trailing runs of this id are masked out of attention (the HF
        ``attention_mask`` semantics — this model takes only token ids, so
        the mask is derived) and positions count real tokens only; a
        left-padded sequence then produces exactly the unpadded activations
        at its real positions. REQUIRED for meaningful activations on
        padded corpora (see :meth:`TokenTextDataset.from_texts`).
    """

    LN_EPS = 1e-5  # HF GPT2Config.layer_norm_epsilon

    # HF zoo: name → (width, depth, heads)
    _HF_VARIANTS = {
        "gpt2": (768, 12, 12),
        "gpt2-medium": (1024, 24, 16),
        "gpt2-large": (1280, 36, 20),
        "gpt2-xl": (1600, 48, 25),
    }

    def __init__(
        self,
        vocab_size: int = 50257,
        n_positions: int = 1024,
        width: int = 768,
        depth: int = 12,
        heads: int = 12,
        dtype=jnp.bfloat16,
        pad_id: int | None = None,
    ):
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.width = width
        self.depth = depth
        self.heads = heads
        self.dtype = dtype
        self.pad_id = pad_id
        self.module_names = tuple(self._enumerate_module_names())

    @classmethod
    def from_name(cls, name: str, *, dtype=jnp.bfloat16, pad_id: int | None = None):
        """Build an HF-zoo-sized GPT-2 (``gpt2`` … ``gpt2-xl``)."""
        if name not in cls._HF_VARIANTS:
            raise ValueError(f"name must be one of {sorted(cls._HF_VARIANTS)}, got {name!r}")
        w, d, h = cls._HF_VARIANTS[name]
        return cls(width=w, depth=d, heads=h, dtype=dtype, pad_id=pad_id)

    # ----------------------------------------------------------------- names
    def _enumerate_module_names(self):
        names = ["transformer", "transformer.wte", "transformer.wpe", "transformer.h"]
        for i in range(self.depth):
            p = f"transformer.h.{i}"
            names += [
                p,
                f"{p}.ln_1",
                f"{p}.attn",
                f"{p}.attn.c_attn",
                f"{p}.attn.heads",
                f"{p}.attn.c_proj",
                f"{p}.ln_2",
                f"{p}.mlp",
                f"{p}.mlp.c_fc",
                f"{p}.mlp.act",
                f"{p}.mlp.c_proj",
            ]
        names += ["transformer.ln_f", "lm_head"]
        return names

    # ----------------------------------------------------------------- specs
    def _param_specs(self):
        w = self.width
        specs = [
            ("transformer.wte.weight", (self.vocab_size, w), "embed"),
            ("transformer.wpe.weight", (self.n_positions, w), "embed"),
        ]
        for i in range(self.depth):
            p = f"transformer.h.{i}"
            specs += [
                (f"{p}.ln_1.weight", (w,), "ones"),
                (f"{p}.ln_1.bias", (w,), "zeros"),
                (f"{p}.attn.c_attn.weight", (w, 3 * w), "conv1d"),
                (f"{p}.attn.c_attn.bias", (3 * w,), "zeros"),
                (f"{p}.attn.c_proj.weight", (w, w), "conv1d_resid"),
                (f"{p}.attn.c_proj.bias", (w,), "zeros"),
                (f"{p}.ln_2.weight", (w,), "ones"),
                (f"{p}.ln_2.bias", (w,), "zeros"),
                (f"{p}.mlp.c_fc.weight", (w, 4 * w), "conv1d"),
                (f"{p}.mlp.c_fc.bias", (4 * w,), "zeros"),
                (f"{p}.mlp.c_proj.weight", (4 * w, w), "conv1d_resid"),
                (f"{p}.mlp.c_proj.bias", (w,), "zeros"),
            ]
        specs += [
            ("transformer.ln_f.weight", (w,), "ones"),
            ("transformer.ln_f.bias", (w,), "zeros"),
        ]
        return specs

    def init(self, rng) -> dict[str, jax.Array]:
        """HF GPT-2 init: N(0, 0.02) weights, residual projections scaled by
        1/sqrt(2·depth), zero biases, unit LN."""
        params = {}
        resid_scale = 1.0 / math.sqrt(2 * self.depth)
        for name, shape, kind in self._param_specs():
            rng, sub = jax.random.split(rng)
            if kind == "ones":
                params[name] = jnp.ones(shape, jnp.float32)
            elif kind == "zeros":
                params[name] = jnp.zeros(shape, jnp.float32)
            else:
                std = 0.02 * (resid_scale if kind == "conv1d_resid" else 1.0)
                params[name] = jax.random.normal(sub, shape, jnp.float32) * std
        return params

    # ----------------------------------------------------------------- apply
    def apply(self, params: Mapping, x, tap_names: Sequence[str] = ()):
        """(B, T) int tokens → (logits (B, T, V), taps). Token taps (B, T, D)."""
        tap = TapCollector(tap_names)
        ids = x.astype(jnp.int32)
        b, t = ids.shape
        if t > self.n_positions:
            raise ValueError(f"sequence length {t} exceeds n_positions {self.n_positions}")

        wte = params["transformer.wte.weight"].astype(self.dtype)
        tok = tap("transformer.wte", wte[ids])
        wpe = params["transformer.wpe.weight"].astype(self.dtype)

        # additive causal mask: (T, T), or (B, 1, T, T) when a pad_id is set
        # (left-padded corpora: pad keys are masked so real tokens never
        # attend to the pad run, and positions count real tokens only —
        # activations at real positions match the unpadded sequence).
        causal = jnp.tril(jnp.ones((t, t), bool))
        if self.pad_id is not None:
            is_pad = edge_pad_mask(ids, self.pad_id)
            pos_ids = jnp.clip(jnp.cumsum(~is_pad, axis=1) - 1, 0)
            pos_b = tap("transformer.wpe", wpe[pos_ids])
            allowed = causal[None] & (~is_pad[:, None, :] | jnp.eye(t, dtype=bool)[None])
            mask = jnp.where(allowed, 0.0, -jnp.inf).astype(jnp.float32)[:, None]
        else:
            pos_b = tap(
                "transformer.wpe", jnp.broadcast_to(wpe[None, :t], (b, t, self.width))
            )
            mask = jnp.where(causal, 0.0, -jnp.inf).astype(jnp.float32)
        h = tok + pos_b

        for i in range(self.depth):
            p = f"transformer.h.{i}"
            n1 = tap(f"{p}.ln_1", layer_norm(
                h, params[f"{p}.ln_1.weight"], params[f"{p}.ln_1.bias"], eps=self.LN_EPS))
            qkv = tap(f"{p}.attn.c_attn", linear(
                n1, params[f"{p}.attn.c_attn.weight"], params[f"{p}.attn.c_attn.bias"]))
            w = self.width
            q, k, v = qkv[..., :w], qkv[..., w : 2 * w], qkv[..., 2 * w :]
            a = scaled_dot_product_attention(q, k, v, self.heads, mask=mask)
            # virtual per-HEAD components "{p}.attn.heads": ‖head h's
            # residual-stream contribution‖ per token, (B, T, H). Requested
            # taps are free on the forward (the fused projection still
            # runs); interventions on the tap rescale each head's
            # contribution — see layers.attn_out_projection.
            a = attn_out_projection(
                tap, f"{p}.attn.heads", f"{p}.attn.c_proj", a,
                params[f"{p}.attn.c_proj.weight"], params[f"{p}.attn.c_proj.bias"],
                self.heads)
            a = tap(f"{p}.attn", a)
            h = residual_add(h, a)
            n2 = tap(f"{p}.ln_2", layer_norm(
                h, params[f"{p}.ln_2.weight"], params[f"{p}.ln_2.bias"], eps=self.LN_EPS))
            m = tap(f"{p}.mlp.c_fc", linear(
                n2, params[f"{p}.mlp.c_fc.weight"], params[f"{p}.mlp.c_fc.bias"]))
            m = tap(f"{p}.mlp.act", gelu(m, approximate=True))  # HF gelu_new
            m = tap(f"{p}.mlp.c_proj", linear(
                m, params[f"{p}.mlp.c_proj.weight"], params[f"{p}.mlp.c_proj.bias"]))
            m = tap(f"{p}.mlp", m)
            h = residual_add(h, m)
            h = tap(p, h)
        h = tap("transformer.h", h)

        h = tap("transformer.ln_f", layer_norm(
            h, params["transformer.ln_f.weight"], params["transformer.ln_f.bias"],
            eps=self.LN_EPS))
        h = tap("transformer", h)
        # tied embedding (HF convention); routed through the shared linear so
        # the logits matmul keeps Precision.HIGHEST and the LRP ε-rule
        logits = tap("lm_head", linear(h, wte.T))
        return logits, tap.taps

    # ------------------------------------------------------------------ load
    def load_torch_state_dict(self, state_dict) -> dict[str, jax.Array]:
        """Convert an HF GPT-2 state dict — a pure shape-validated copy:
        ``Conv1D`` already stores (in, out), embeddings are (V, D)/(P, D).
        Accepts ``GPT2LMHeadModel`` keys (``transformer.``-prefixed) or bare
        ``GPT2Model`` keys; ``lm_head.weight`` (tied) and the causal-mask
        buffers (``attn.bias``/``attn.masked_bias``) are derived and ignored.
        """
        params = {}
        for name, shape, _ in self._param_specs():
            if name in state_dict:
                value = state_dict[name]
            else:
                bare = name.removeprefix("transformer.")
                if bare not in state_dict:
                    raise KeyError(f"{name} (also tried {bare!r}) missing from state dict")
                value = state_dict[bare]
            arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
            if tuple(arr.shape) != tuple(shape):
                raise ValueError(f"{name}: checkpoint shape {arr.shape} != expected {shape}")
            params[name] = jnp.asarray(arr, jnp.float32)
        return params

    def __repr__(self):
        return (
            f"GPT2(vocab_size={self.vocab_size}, n_positions={self.n_positions}, "
            f"width={self.width}, depth={self.depth}, heads={self.heads})"
        )
