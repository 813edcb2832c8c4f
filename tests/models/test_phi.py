"""Phi-3 subject family: fused qkv/gate_up projections, HF parity, taps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import Phi3

V, T, D, DEPTH, HEADS, KV, INTER = 97, 14, 32, 2, 4, 2, 48


def make_tiny(**kw):
    args = dict(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                kv_heads=KV, intermediate=INTER, rms_eps=1e-5, dtype=jnp.float32)
    args.update(kw)
    return Phi3(**args)


@pytest.fixture(scope="module")
def tiny_phi():
    model = make_tiny(sliding_window=6)
    return model, model.init(jax.random.PRNGKey(0))


def test_forward_shapes_and_fused_taps(tiny_phi):
    model, params = tiny_phi
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, size=(3, T)))
    logits, taps = model.apply(params, ids, tap_names=(
        "model.layers.0.self_attn.qkv_proj", "model.layers.1.mlp.gate_up_proj",
        "model.layers.1.mlp.activation_fn", "model.layers.0.self_attn"))
    assert logits.shape == (3, T, V)
    hd = D // HEADS
    assert taps["model.layers.0.self_attn.qkv_proj"].shape == (3, T, (HEADS + 2 * KV) * hd)
    assert taps["model.layers.1.mlp.gate_up_proj"].shape == (3, T, 2 * INTER)
    assert taps["model.layers.1.mlp.activation_fn"].shape == (3, T, INTER)
    assert taps["model.layers.0.self_attn"].shape == (3, T, D)


def test_every_advertised_name_is_tapped_batch_leading(tiny_phi):
    model, params = tiny_phi
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, size=(2, T)))
    _, taps = model.apply(params, ids, tap_names=model.module_names)
    missing = set(model.module_names) - set(taps)
    assert not missing, f"advertised but never tapped: {sorted(missing)}"
    for name, value in taps.items():
        assert value.shape[0] == 2, f"{name} not batch-leading: {value.shape}"


def test_hf_transformers_parity_with_sliding_window():
    """Logits match a real HF Phi3ForCausalLM — fused qkv/gate_up split
    boundaries, GQA, and the sliding window (window < seq_len) all
    load-bearing."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Phi3Config(
        vocab_size=V, hidden_size=D, intermediate_size=INTER,
        num_hidden_layers=DEPTH, num_attention_heads=HEADS,
        num_key_value_heads=KV, max_position_embeddings=32,
        rms_norm_eps=1e-5, rope_theta=10000.0, sliding_window=6,
        attention_dropout=0.0, resid_pdrop=0.0, embd_pdrop=0.0,
        tie_word_embeddings=False, pad_token_id=0,  # default 32000 > tiny vocab
        attn_implementation="eager")
    hf = transformers.Phi3ForCausalLM(cfg).eval()
    model = make_tiny(sliding_window=6)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(2).integers(0, V, size=(2, 19))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)

    # the window changes the output vs. full causal attention
    full, _ = make_tiny().apply(params, jnp.asarray(ids))
    assert np.abs(np.asarray(full) - np.asarray(got)).max() > 1e-4


def test_from_name_variants():
    m = Phi3.from_name("phi-3-mini-4k", dtype=jnp.float32)
    assert (m.width, m.depth, m.heads, m.kv_heads) == (3072, 32, 32, 32)
    assert m.sliding_window == 2047 and not m.tie_word_embeddings
    m2 = Phi3.from_name("phi-3-medium-4k", dtype=jnp.float32)
    assert (m2.width, m2.heads, m2.kv_heads) == (5120, 40, 10)
    with pytest.raises(ValueError, match="phi"):
        Phi3.from_name("phi-2")


def test_phi3_tp_specs_place():
    from semanticlens_tpu.parallel import phi3_param_specs_2d, shard_params
    from jax.sharding import Mesh, PartitionSpec as P

    model = make_tiny()
    params = model.init(jax.random.PRNGKey(0))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), axis_names=("data", "model"))
    sharded = shard_params(params, mesh, phi3_param_specs_2d(model))
    assert tuple(sharded["model.layers.0.self_attn.qkv_proj.weight"].sharding.spec) \
        == (None, "model")
    assert tuple(sharded["model.layers.0.mlp.down_proj.weight"].sharding.spec) \
        == ("model", None)
    assert sharded["model.norm.weight"].sharding.spec == P()


def test_fused_channels_through_collect(tiny_phi):
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_max

    model, params = tiny_phi
    rows = np.random.default_rng(3).integers(0, V, size=(12, T), dtype=np.int32)
    eng = CollectEngine(
        model=model,
        layer_names=["model.layers.1.mlp.activation_fn",
                     "model.layers.0.self_attn.heads"],
        aggregation_fn=aggregate_transformer_max, n_collect=3,
        input_preprocess=lambda x: x.astype(jnp.int32))
    states, n = eng.run(params, ArrayDataset(rows, name="toks"), batch_size=4)
    assert n == 12
    assert states["model.layers.1.mlp.activation_fn"].values.shape == (INTER, 3)
    assert states["model.layers.0.self_attn.heads"].values.shape == (HEADS, 3)


def test_lrp_conserves_end_to_end(tiny_phi):
    """ε-LRP conservation through the fused projections: the qkv slice
    routes all relevance through the value lanes (CP-LRP), the gate_up
    slice through the up half (constant gate) — no biases anywhere, so
    embedding relevance equals the seeded activation sum."""
    from semanticlens_tpu.models.base import interventions
    from semanticlens_tpu.models.layers import lrp_composite

    model, params = tiny_phi
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
