"""Llama subject family: HF-name parity, GQA, RoPE, SwiGLU, tap contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import Llama

V, T, D, DEPTH, HEADS, KV, INTER = 97, 16, 32, 2, 4, 2, 48


def make_tiny(**kw):
    args = dict(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                kv_heads=KV, intermediate=INTER, rms_eps=1e-6, dtype=jnp.float32)
    args.update(kw)
    return Llama(**args)


@pytest.fixture(scope="module")
def tiny_llama():
    model = make_tiny()
    return model, model.init(jax.random.PRNGKey(0))


def test_forward_shapes_and_taps(tiny_llama):
    model, params = tiny_llama
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, size=(3, T)))
    logits, taps = model.apply(params, ids, tap_names=(
        "model.layers.1.mlp.act_fn", "model.layers.0.self_attn", "lm_head",
        "model.layers.0.self_attn.k_proj"))
    assert logits.shape == (3, T, V)
    assert taps["model.layers.1.mlp.act_fn"].shape == (3, T, INTER)
    assert taps["model.layers.0.self_attn"].shape == (3, T, D)
    # GQA: k_proj carries kv_heads·head_dim channels, not width
    assert taps["model.layers.0.self_attn.k_proj"].shape == (3, T, KV * (D // HEADS))
    assert taps["lm_head"].shape == (3, T, V)


def test_every_advertised_name_is_tapped_batch_leading(tiny_llama):
    model, params = tiny_llama
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, size=(2, T)))
    _, taps = model.apply(params, ids, tap_names=model.module_names)
    missing = set(model.module_names) - set(taps)
    assert not missing, f"advertised but never tapped: {sorted(missing)}"
    for name, value in taps.items():
        assert value.shape[0] == 2, f"{name} not batch-leading: {value.shape}"


def test_causality(tiny_llama):
    model, params = tiny_llama
    rng = np.random.default_rng(2)
    ids = rng.integers(0, V, size=(1, T))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % V
    out1, _ = model.apply(params, jnp.asarray(ids))
    out2, _ = model.apply(params, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out1[0, :-1]), np.asarray(out2[0, :-1]),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out1[0, -1]) - np.asarray(out2[0, -1])).max() > 1e-4


def _hf_pair(tie: bool, rope_scaling=None, n_pos=32):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=n_pos,
        rms_norm_eps=1e-6, rope_theta=10000.0, rope_scaling=rope_scaling,
        tie_word_embeddings=tie, attention_dropout=0.0)
    hf = transformers.LlamaForCausalLM(cfg).eval()
    model = make_tiny(n_positions=n_pos, tie_word_embeddings=tie,
                      rope_scaling=rope_scaling)
    return hf, model


@pytest.mark.parametrize("tie", [False, True])
def test_hf_transformers_parity(tie):
    """Logits match a real Hugging Face LlamaForCausalLM (GQA + RoPE +
    RMSNorm + SwiGLU all in play); nn.Linear weights transpose at load."""
    torch = pytest.importorskip("torch")
    hf, model = _hf_pair(tie)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(0).integers(0, V, size=(3, 17))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_hf_parity_llama3_rope_scaling():
    """The llama3 rope-scaling frequency rescale matches HF exactly (the
    Llama 3.1/3.2 checkpoint configuration)."""
    torch = pytest.importorskip("torch")
    scaling = {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
               "high_freq_factor": 4.0,
               "original_max_position_embeddings": 16}
    hf, model = _hf_pair(False, rope_scaling=scaling, n_pos=64)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(1).integers(0, V, size=(2, 40))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_hf_parity_mistral_sliding_window():
    """Mistral = Llama + sliding-window attention; with window < seq_len the
    windowed mask is actually load-bearing, pinned against HF."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.MistralConfig(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=32,
        rms_norm_eps=1e-6, rope_theta=10000.0, sliding_window=5,
        attention_dropout=0.0, tie_word_embeddings=False)
    hf = transformers.MistralForCausalLM(cfg).eval()
    # ensure eager attention actually applies the window (sdpa does too in
    # recent transformers, but eager is unambiguous)
    hf.config._attn_implementation = "eager"
    model = make_tiny(sliding_window=5)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(5).integers(0, V, size=(2, 19))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # the window changes the output vs. full causal attention
    full, _ = make_tiny().apply(params, jnp.asarray(ids))
    assert np.abs(np.asarray(full) - np.asarray(got)).max() > 1e-4


def test_hf_parity_qwen2_attention_bias():
    """Qwen2 = Llama + q/k/v biases, pinned against HF Qwen2ForCausalLM."""
    from semanticlens_tpu.models import Qwen2

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Qwen2Config(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=32,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_dropout=0.0,
        tie_word_embeddings=False, use_sliding_window=False)
    hf = transformers.Qwen2ForCausalLM(cfg).eval()
    # random (non-zero) biases so the bias path is load-bearing
    with torch.no_grad():
        for n, t in hf.named_parameters():
            if n.endswith("proj.bias"):
                t.normal_(0.0, 0.5)
    model = Qwen2(vocab_size=V, n_positions=32, width=D, depth=DEPTH,
                  heads=HEADS, kv_heads=KV, intermediate=INTER,
                  rms_eps=1e-6, dtype=jnp.float32)
    assert model.attention_bias
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(6).integers(0, V, size=(2, 15))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    q = Qwen2.from_name("qwen2.5-0.5b", dtype=jnp.float32)
    assert (q.width, q.depth, q.heads, q.kv_heads) == (896, 24, 14, 2)
    assert q.tie_word_embeddings and q.attention_bias


def test_from_name_and_limits():
    m = Llama.from_name("llama-3.2-1b", dtype=jnp.float32)
    assert (m.width, m.depth, m.heads, m.kv_heads) == (2048, 16, 32, 8)
    assert m.tie_word_embeddings and m.rope_scaling is not None
    assert "lm_head.weight" not in [n for n, _, _ in m._param_specs()]
    m2 = Llama.from_name("llama-2-7b", dtype=jnp.float32)
    assert m2.kv_heads == 32 and m2.rope_scaling is None
    with pytest.raises(ValueError, match="llama"):
        Llama.from_name("llama-9")
    with pytest.raises(ValueError, match="divisible"):
        make_tiny(kv_heads=3)
    tiny = make_tiny()
    params = tiny.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="exceeds n_positions"):
        tiny.apply(params, jnp.zeros((1, 33), jnp.int32))


def test_attention_head_components(tiny_llama):
    """With W_O = identity the '…self_attn.heads' tap equals the per-slice
    norms of the o_proj output (same contract as GPT2's heads tap)."""
    model, params = tiny_llama
    p = dict(params)
    p["model.layers.0.self_attn.o_proj.weight"] = jnp.eye(D, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, V, size=(2, T)))
    _, taps = model.apply(p, ids, tap_names=(
        "model.layers.0.self_attn.heads", "model.layers.0.self_attn.o_proj"))
    norms = np.asarray(taps["model.layers.0.self_attn.heads"])
    assert norms.shape == (2, T, HEADS)
    merged = np.asarray(taps["model.layers.0.self_attn.o_proj"], np.float32)
    want = np.linalg.norm(merged.reshape(2, T, HEADS, D // HEADS), axis=-1)
    np.testing.assert_allclose(norms, want, rtol=1e-4, atol=1e-5)


def test_swiglu_components_through_collect():
    """Gated-MLP channels flow through the standard pipeline."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_max

    model = make_tiny(depth=1)
    params = model.init(jax.random.PRNGKey(1))
    rows = np.random.default_rng(1).integers(0, V, size=(12, T), dtype=np.int32)
    eng = CollectEngine(model=model, layer_names=["model.layers.0.mlp.act_fn"],
                        aggregation_fn=aggregate_transformer_max, n_collect=3,
                        input_preprocess=lambda x: x.astype(jnp.int32))
    states, n = eng.run(params, ArrayDataset(rows, name="toks"), batch_size=4)
    assert n == 12
    assert states["model.layers.0.mlp.act_fn"].values.shape == (INTER, 3)


def test_lrp_conserves_end_to_end(tiny_llama):
    """ε-LRP conservation through the FULL Llama stack: unlike GPT-2
    (biases + additive positional embeddings absorb relevance), Llama has
    no biases anywhere and RoPE lives on the zero-relevance q/k path, so
    embedding relevance must sum to the seeded activation exactly —
    detached-RMSNorm (diagonal), CP-LRP attention (linear value path),
    SwiGLU constant-gate, and proportional residual splits all conserving."""
    from semanticlens_tpu.models.base import interventions
    from semanticlens_tpu.models.layers import lrp_composite

    model, params = tiny_llama
    ids = jnp.asarray(np.random.default_rng(7).integers(0, V, size=(2, T)))
    target = "model.layers.1.mlp.down_proj"

    def f(delta):
        with interventions({"model.embed_tokens": lambda v: v + delta.astype(v.dtype)}):
            _, taps = model.apply(params, ids, (target,))
        return taps[target].astype(jnp.float32)

    with lrp_composite("epsilon", epsilon=1e-9):
        out, vjp_fn = jax.vjp(f, jnp.zeros((2, T, D), jnp.float32))
        (r_emb,) = vjp_fn(out)
    r_in = float(np.asarray(r_emb, np.float64).sum())
    r_out = float(np.asarray(out, np.float64).sum())
    np.testing.assert_allclose(r_in, r_out, rtol=5e-3)


def test_lrp_relevance_reaches_embedding(tiny_llama):
    """Token-level LRP runs end-to-end: RMSNorm detached rule + CP-LRP
    attention + SwiGLU gate rule produce finite, non-degenerate relevance
    at the embedding tap."""
    from semanticlens_tpu.models.layers import lrp_composite

    model, params = tiny_llama
    ids = jnp.asarray(np.random.default_rng(4).integers(0, V, size=(1, T)))

    with lrp_composite("epsilon_plus_flat"):
        def f(wte):
            p2 = dict(params)
            p2["model.embed_tokens.weight"] = wte
            logits, taps = model.apply(
                p2, ids, tap_names=("model.layers.1.mlp.act_fn",))
            return taps["model.layers.1.mlp.act_fn"]

        acts, vjp = jax.vjp(f, params["model.embed_tokens.weight"])
        # activation-seeded relevance for one component (channel 0)
        seed = jnp.zeros_like(acts).at[..., 0].set(acts[..., 0])
        (rel,) = vjp(seed)
    rel = np.asarray(rel)
    assert np.isfinite(rel).all()
    assert np.abs(rel).sum() > 0


def test_left_padding_with_pad_id_matches_unpadded():
    """Llama pad masking: left-padded real positions match the unpadded
    forward exactly (RoPE angles follow real-token positions)."""
    from semanticlens_tpu.models import Llama

    model = Llama(vocab_size=61, n_positions=32, width=32, depth=2, heads=4,
                  kv_heads=2, intermediate=48, dtype=jnp.float32, pad_id=0)
    params = model.init(jax.random.PRNGKey(0))
    toks = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    padded = jnp.asarray([[0, 0, 0, 0, 5, 6, 7, 8]], jnp.int32)
    layer = "model.layers.1.mlp.act_fn"
    o1, t1 = model.apply(params, toks, (layer,))
    o2, t2 = model.apply(params, padded, (layer,))
    np.testing.assert_allclose(
        np.asarray(o1[0]), np.asarray(o2[0, 4:]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t1[layer][0]), np.asarray(t2[layer][0, 4:]), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(o2)).all()


def test_decoupled_head_dim_config_is_accepted():
    """An explicit head_dim lifts the width %% heads divisibility requirement
    (Gemma-style decoupled heads); without one, the guard still fires."""
    from semanticlens_tpu.models import Llama

    model = Llama(vocab_size=31, n_positions=16, width=36, depth=1, heads=5,
                  head_dim=8, intermediate=48, dtype=jnp.float32)
    assert model.head_dim == 8
    params = model.init(jax.random.PRNGKey(0))
    logits, _ = model.apply(params, jnp.asarray([[1, 2, 3]], jnp.int32))
    assert logits.shape == (1, 3, 31)
    assert np.isfinite(np.asarray(logits)).all()

    with pytest.raises(ValueError):
        Llama(vocab_size=31, n_positions=16, width=36, depth=1, heads=5)
