"""Gemma/Gemma2 subject family: HF-name parity, GeGLU, softcaps, tap contract."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import Gemma, Gemma2

V, T, D, DEPTH, HEADS, KV, HD, INTER = 89, 12, 32, 2, 4, 2, 16, 48


def make_tiny(cls=Gemma, **kw):
    args = dict(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                kv_heads=KV, head_dim=HD, intermediate=INTER, rms_eps=1e-6,
                dtype=jnp.float32)
    args.update(kw)
    return cls(**args)


@pytest.fixture(scope="module")
def tiny_gemma2():
    model = make_tiny(Gemma2, sliding_window=5, query_pre_attn_scalar=13.0)
    return model, model.init(jax.random.PRNGKey(0))


def test_forward_shapes_and_taps(tiny_gemma2):
    model, params = tiny_gemma2
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, size=(3, T)))
    logits, taps = model.apply(params, ids, tap_names=(
        "model.layers.1.mlp.act_fn", "model.layers.0.self_attn",
        "model.layers.0.pre_feedforward_layernorm",
        "model.layers.0.self_attn.q_proj", "lm_head"))
    assert logits.shape == (3, T, V)
    assert taps["model.layers.1.mlp.act_fn"].shape == (3, T, INTER)
    assert taps["model.layers.0.self_attn"].shape == (3, T, D)
    assert taps["model.layers.0.pre_feedforward_layernorm"].shape == (3, T, D)
    # decoupled head_dim: q_proj carries heads·head_dim channels, not width
    assert taps["model.layers.0.self_attn.q_proj"].shape == (3, T, HEADS * HD)
    # final soft-cap bounds the returned logits but not the lm_head tap
    assert np.abs(np.asarray(logits)).max() <= 30.0


@pytest.mark.parametrize("cls", [Gemma, Gemma2])
def test_every_advertised_name_is_tapped_batch_leading(cls, tiny_gemma2):
    if cls is Gemma2:
        model, params = tiny_gemma2
    else:
        model = make_tiny(cls)
        params = model.init(jax.random.PRNGKey(1))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, size=(2, T)))
    _, taps = model.apply(params, ids, tap_names=model.module_names)
    missing = set(model.module_names) - set(taps)
    assert not missing, f"advertised but never tapped: {sorted(missing)}"
    for name, value in taps.items():
        assert value.shape[0] == 2, f"{name} not batch-leading: {value.shape}"


def _hf_gemma(tiny):
    transformers = pytest.importorskip("transformers")
    cfg = transformers.GemmaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD, max_position_embeddings=32,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_dropout=0.0,
        hidden_act="gelu_pytorch_tanh", attn_implementation="eager")
    hf = transformers.GemmaForCausalLM(cfg).eval()
    return hf, tiny


def test_hf_transformers_parity_gemma1():
    """Logits match a real HF GemmaForCausalLM — the (1+w) RMSNorm, √width
    embedding scale, GeGLU, and decoupled head_dim are all load-bearing
    (zero-init norm weights are randomized so (1+w) ≠ 1)."""
    torch = pytest.importorskip("torch")
    hf, model = _hf_gemma(make_tiny())
    with torch.no_grad():
        for n, t in hf.named_parameters():
            if "layernorm" in n or n.endswith("norm.weight"):
                t.normal_(0.0, 0.3)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(0).integers(0, V, size=(3, 17))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_hf_transformers_parity_gemma2():
    """Logits match a real HF Gemma2ForCausalLM with every Gemma-2 quirk in
    play: sandwich norms, attention + final tanh soft-capping, the
    query_pre_attn_scalar scale, and the alternating local/global window
    (window < seq_len so the even-layer mask is load-bearing)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Gemma2Config(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, head_dim=HD, max_position_embeddings=32,
        rms_norm_eps=1e-6, rope_theta=10000.0, attention_dropout=0.0,
        hidden_act="gelu_pytorch_tanh", sliding_window=5,
        query_pre_attn_scalar=13.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, attn_implementation="eager")
    hf = transformers.Gemma2ForCausalLM(cfg).eval()
    with torch.no_grad():
        for n, t in hf.named_parameters():
            if "layernorm" in n or n.endswith("norm.weight"):
                t.normal_(0.0, 0.3)
    model = make_tiny(Gemma2, sliding_window=5, query_pre_attn_scalar=13.0)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(1).integers(0, V, size=(2, 19))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # the alternating window changes the output vs. all-global attention
    all_global = make_tiny(Gemma2, sliding_window=None, query_pre_attn_scalar=13.0)
    full, _ = all_global.apply(params, jnp.asarray(ids))
    assert np.abs(np.asarray(full) - np.asarray(got)).max() > 1e-4


def test_from_name_and_variants():
    m = Gemma.from_name("gemma-2b", dtype=jnp.float32)
    assert (m.width, m.heads, m.kv_heads, m.head_dim) == (2048, 8, 1, 256)
    assert m.tie_word_embeddings
    assert "lm_head.weight" not in [n for n, _, _ in m._param_specs()]
    m2 = Gemma2.from_name("gemma-2-27b", dtype=jnp.float32)
    assert (m2.width, m2.head_dim, m2.query_pre_attn_scalar) == (4608, 128, 144.0)
    assert m2._layer_window(0) == 4096 and m2._layer_window(1) is None
    with pytest.raises(ValueError, match="gemma"):
        Gemma.from_name("gemma-3b")


def test_left_padding_with_pad_id_matches_unpadded():
    model = make_tiny(Gemma2, sliding_window=3, pad_id=0)
    params = model.init(jax.random.PRNGKey(2))
    toks = jnp.asarray([[5, 6, 7, 8, 9]], jnp.int32)
    padded = jnp.asarray([[0, 0, 0, 5, 6, 7, 8, 9]], jnp.int32)
    layer = "model.layers.1.mlp.act_fn"
    o1, t1 = model.apply(params, toks, (layer,))
    o2, t2 = model.apply(params, padded, (layer,))
    np.testing.assert_allclose(
        np.asarray(o1[0]), np.asarray(o2[0, 3:]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(t1[layer][0]), np.asarray(t2[layer][0, 3:]), rtol=1e-5, atol=1e-5)
    assert np.isfinite(np.asarray(o2)).all()


def test_gemma_components_through_collect():
    """GeGLU channels and attention heads flow through the standard
    Collect pipeline (the tap contract the whole framework rides on)."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_max

    model = make_tiny(Gemma2, depth=2, sliding_window=5)
    params = model.init(jax.random.PRNGKey(3))
    rows = np.random.default_rng(3).integers(0, V, size=(12, T), dtype=np.int32)
    eng = CollectEngine(
        model=model,
        layer_names=["model.layers.0.mlp.act_fn", "model.layers.1.self_attn.heads"],
        aggregation_fn=aggregate_transformer_max, n_collect=3,
        input_preprocess=lambda x: x.astype(jnp.int32))
    states, n = eng.run(params, ArrayDataset(rows, name="toks"), batch_size=4)
    assert n == 12
    assert states["model.layers.0.mlp.act_fn"].values.shape == (INTER, 3)
    assert states["model.layers.1.self_attn.heads"].values.shape == (HEADS, 3)


def test_lrp_conserves_end_to_end(tiny_gemma2):
    """ε-LRP conservation through the FULL Gemma-2 stack: (1+w) detached
    RMSNorm (diagonal), CP-LRP soft-capped attention (the capped probs are
    constants), GeGLU constant-gate, sandwich norms, and proportional
    residual splits all conserving — Gemma has no biases anywhere, so
    embedding relevance must sum to the seeded activation."""
    from semanticlens_tpu.models.base import interventions
    from semanticlens_tpu.models.layers import lrp_composite

    model, params = tiny_gemma2
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
