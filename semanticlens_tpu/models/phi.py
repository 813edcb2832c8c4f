"""Functional Phi-3 causal LM with named activation taps.

Beyond-reference subject family (the reference dissects vision models only,
reference README.md:4, activation_based.py:41): Microsoft's Phi-3 recipe is
the Llama decoder with **fused projections** — one ``qkv_proj`` matmul
emitting q‖k‖v and one ``gate_up_proj`` emitting gate‖up — plus a sliding
attention window (2047 for the 4k-context checkpoints). Module and
parameter names follow Hugging Face ``Phi3ForCausalLM``
(``model.layers.3.mlp.gate_up_proj`` …) so user layer names and HF
checkpoints carry over verbatim; logits are pinned against `transformers`
in tests/models/test_phi.py. The fused layout is MXU-friendlier than
Llama's: three projections per block instead of six, each a larger matmul.

Tap notes: ``…self_attn.qkv_proj`` is the fused (B, T, (H+2·KV)·hd) module
output; ``…mlp.gate_up_proj`` the fused (B, T, 2·I) output;
``…mlp.activation_fn`` the gated SiLU channels (B, T, I) — the natural
per-channel MLP components. The virtual ``…self_attn.heads`` tap and all
LRP rules (CP-LRP attention, SwiGLU constant gate, detached RMSNorm)
inherit from the shared decoder skeleton in models/llama.py.

Long-context Phi-3.5 checkpoints use "longrope" frequency interpolation,
which this module does not implement — the presets here are the 4k-context
checkpoints whose RoPE is the standard table.
"""

from __future__ import annotations

from semanticlens_tpu.models.layers import gate_scale, linear, silu
from semanticlens_tpu.models.llama import Llama


class Phi3(Llama):
    """Phi-3 causal LM, HF ``Phi3ForCausalLM`` names, (B, T) int tokens."""

    # HF zoo: name → ctor kwargs (pinned from the checkpoints' config.json)
    _HF_VARIANTS = {
        "phi-3-mini-4k": dict(
            vocab_size=32064, n_positions=4096, width=3072, depth=32, heads=32,
            kv_heads=32, intermediate=8192, rope_theta=1e4, rms_eps=1e-5,
            sliding_window=2047),
        "phi-3-medium-4k": dict(
            vocab_size=32064, n_positions=4096, width=5120, depth=40, heads=40,
            kv_heads=10, intermediate=17920, rope_theta=1e4, rms_eps=1e-5,
            sliding_window=2047),
    }

    def _block_module_names(self, p: str) -> list[str]:
        return [
            f"{p}.self_attn",
            f"{p}.self_attn.qkv_proj",
            f"{p}.self_attn.heads",
            f"{p}.self_attn.o_proj",
            f"{p}.mlp",
            f"{p}.mlp.gate_up_proj",
            f"{p}.mlp.activation_fn",
            f"{p}.mlp.down_proj",
        ]

    def _block_param_specs(self, p: str) -> list:
        w, hd = self.width, self.head_dim
        fused = (self.heads + 2 * self.kv_heads) * hd
        return [
            (f"{p}.self_attn.qkv_proj.weight", (w, fused), "linear"),
            (f"{p}.self_attn.o_proj.weight", (self.heads * hd, w), "linear"),
            (f"{p}.mlp.gate_up_proj.weight", (w, 2 * self.intermediate), "linear"),
            (f"{p}.mlp.down_proj.weight", (self.intermediate, w), "linear"),
        ]

    def _qkv(self, tap, params, p, n1):
        """Fused projection, split q‖k‖v (the HF ``Phi3Attention`` layout)."""
        qkv = tap(f"{p}.self_attn.qkv_proj", linear(
            n1, params[f"{p}.self_attn.qkv_proj.weight"]))
        qd = self.heads * self.head_dim
        kd = self.kv_heads * self.head_dim
        return qkv[..., :qd], qkv[..., qd:qd + kd], qkv[..., qd + kd:]

    def _mlp(self, tap, params, p, n2):
        """Fused gate‖up, SiLU gate (HF ``Phi3MLP``: first half gates)."""
        gu = tap(f"{p}.mlp.gate_up_proj", linear(
            n2, params[f"{p}.mlp.gate_up_proj.weight"]))
        g, u = gu[..., :self.intermediate], gu[..., self.intermediate:]
        act = tap(f"{p}.mlp.activation_fn", silu(g))
        m = gate_scale(u, act)  # CP-LRP constant gate (see llama.py)
        m = tap(f"{p}.mlp.down_proj", linear(m, params[f"{p}.mlp.down_proj.weight"]))
        return tap(f"{p}.mlp", m)
