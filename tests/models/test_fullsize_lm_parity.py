"""FULL-SIZE LM parity: HF twins at real model dimensions.

Same rationale as tests/foundation_models/test_fullsize_parity.py (the
round-2 verdict's proof-depth requirement): tiny-model conversion tests
can't catch full-size bug classes — rope-frequency tables at real
head_dim/theta, GQA grouping at the real 32q/8kv ratio, LN/RMS eps at real
width, tied-head routing — so the LM subject families get the same
treatment as the FM towers. Random weights, real configs, logits compared
elementwise.

Only deliberate size reduction: Llama-3.2-1B's 128 256-row vocabulary (a
pure embedding row-gather that cannot hide a layout bug) shrinks to 2 048
rows; GPT-2 runs with ZERO reductions (real 50 257 vocab, 12×768, 12
heads). Every depth/width/head/kv/intermediate/rope dimension is real.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from semanticlens_tpu.models import GPT2, Llama  # noqa: E402


def _assert_logit_parity(got, want, label):
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale, rtol=0, err_msg=label)
    # cosine over the vocab axis — the score that drives evidence ranking
    cos = np.sum(got * want, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert cos.min() > 0.999, f"{label}: cosine {cos.min()} below 0.999"


def test_gpt2_fullsize_parity():
    """Real `gpt2` config end to end — no reduced dimension anywhere."""
    torch.manual_seed(0)
    cfg = transformers.GPT2Config(resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    model = GPT2(dtype=jnp.float32)  # defaults = HF gpt2
    assert (model.width, model.depth, model.heads) == (768, 12, 12)
    params = model.load_torch_state_dict(hf.state_dict())

    ids = np.random.default_rng(0).integers(0, cfg.vocab_size, size=(2, 48))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids))[0])
    _assert_logit_parity(got, want, "gpt2 full-size")


def test_llama_3_2_1b_fullsize_parity():
    """Llama-3.2-1B at real depth/width/heads/kv/intermediate/rope — the
    GQA 32q/8kv grouping, llama3 frequency rescale at theta 500k and
    head_dim 64, RMSNorm at width 2048, and the tied lm_head all at
    production scale. Vocab shrunk 128 256 → 2 048 (row-gather only)."""
    VOCAB = 2048
    torch.manual_seed(1)
    cfg = transformers.LlamaConfig(
        vocab_size=VOCAB, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=16, num_attention_heads=32, num_key_value_heads=8,
        max_position_embeddings=131072, rms_norm_eps=1e-5, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        tie_word_embeddings=True, attention_dropout=0.0)
    hf = transformers.LlamaForCausalLM(cfg).eval()

    preset = Llama.from_name("llama-3.2-1b", dtype=jnp.float32)
    model = Llama(VOCAB, preset.n_positions, preset.width, preset.depth,
                  preset.heads, preset.kv_heads, preset.intermediate,
                  rope_theta=preset.rope_theta, rope_scaling=preset.rope_scaling,
                  rms_eps=preset.rms_eps, tie_word_embeddings=True,
                  dtype=jnp.float32)
    assert (model.width, model.depth, model.heads, model.kv_heads,
            model.intermediate) == (2048, 16, 32, 8, 8192)
    params = model.load_torch_state_dict(hf.state_dict())

    ids = np.random.default_rng(1).integers(0, VOCAB, size=(2, 32))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids))[0])
    _assert_logit_parity(got, want, "llama-3.2-1b full-size")


def test_gemma2_2b_fullsize_parity():
    """Gemma-2-2B at real depth/width/heads/kv/head_dim/intermediate — the
    decoupled head_dim 256 (q/k/v are 2304→2048/1024), query_pre_attn_scalar
    256 ≠ head_dim, both tanh soft-caps, sandwich norms, and the alternating
    4096-token window (inert at T=32 but wired) at production scale. Vocab
    shrunk 256 000 → 2 048 (row-gather only)."""
    from semanticlens_tpu.models import Gemma2

    VOCAB = 2048
    torch.manual_seed(2)
    cfg = transformers.Gemma2Config(
        vocab_size=VOCAB, hidden_size=2304, intermediate_size=9216,
        num_hidden_layers=26, num_attention_heads=8, num_key_value_heads=4,
        head_dim=256, max_position_embeddings=8192, rms_norm_eps=1e-6,
        rope_theta=10000.0, sliding_window=4096, query_pre_attn_scalar=256,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        hidden_act="gelu_pytorch_tanh", attention_dropout=0.0,
        attn_implementation="eager")
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    # RMSNorm weights are zero-init (the (1+w) scale starts at identity);
    # randomize so the (1+w) convention is load-bearing at full depth
    with torch.no_grad():
        for n, t in hf.named_parameters():
            if "layernorm" in n or n.endswith("norm.weight"):
                t.normal_(0.0, 0.2)

    preset = Gemma2.from_name("gemma-2-2b", dtype=jnp.float32)
    model = Gemma2(VOCAB, preset.n_positions, preset.width, preset.depth,
                   preset.heads, preset.kv_heads, preset.intermediate,
                   head_dim=preset.head_dim, rope_theta=preset.rope_theta,
                   rms_eps=preset.rms_eps, sliding_window=preset.sliding_window,
                   query_pre_attn_scalar=preset.query_pre_attn_scalar,
                   dtype=jnp.float32)
    assert (model.width, model.depth, model.heads, model.kv_heads,
            model.head_dim, model.intermediate) == (2304, 26, 8, 4, 256, 9216)
    params = model.load_torch_state_dict(hf.state_dict())

    ids = np.random.default_rng(2).integers(0, VOCAB, size=(2, 32))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got = np.asarray(model.apply(params, jnp.asarray(ids))[0])
    _assert_logit_parity(got, want, "gemma-2-2b full-size")
