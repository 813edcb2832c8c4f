"""GPT-2 subject family: HF-name parity, tap contract, LM specifics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semanticlens_tpu.models import GPT2

V, T, D, DEPTH, HEADS = 97, 16, 48, 2, 4


@pytest.fixture(scope="module")
def tiny_gpt():
    model = GPT2(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                 dtype=jnp.float32)
    return model, model.init(jax.random.PRNGKey(0))


def test_forward_shapes_and_taps(tiny_gpt):
    model, params = tiny_gpt
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, size=(3, T)))
    logits, taps = model.apply(params, ids, tap_names=(
        "transformer.h.1.mlp.act", "transformer.h.0.attn", "transformer.wpe", "lm_head"))
    assert logits.shape == (3, T, V)
    assert taps["transformer.h.1.mlp.act"].shape == (3, T, 4 * D)
    assert taps["transformer.h.0.attn"].shape == (3, T, D)
    assert taps["transformer.wpe"].shape == (3, T, D)  # broadcast batch-leading
    assert taps["lm_head"].shape == (3, T, V)


def test_every_advertised_name_is_tapped_batch_leading(tiny_gpt):
    """Same contract tests/models/test_tap_contract.py pins for the vision
    zoo — GPT taps token batches, so it gets its own case here."""
    model, params = tiny_gpt
    ids = jnp.asarray(np.random.default_rng(1).integers(0, V, size=(2, T)))
    _, taps = model.apply(params, ids, tap_names=model.module_names)
    missing = set(model.module_names) - set(taps)
    assert not missing, f"advertised but never tapped: {sorted(missing)}"
    for name, value in taps.items():
        assert value.shape[0] == 2, f"{name} not batch-leading: {value.shape}"


def test_causality(tiny_gpt):
    """Changing a future token must not change past logits (causal mask)."""
    model, params = tiny_gpt
    rng = np.random.default_rng(2)
    ids = rng.integers(0, V, size=(1, T))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % V
    out1, _ = model.apply(params, jnp.asarray(ids))
    out2, _ = model.apply(params, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out1[0, :-1]), np.asarray(out2[0, :-1]),
                               rtol=1e-5, atol=1e-5)
    assert np.abs(np.asarray(out1[0, -1]) - np.asarray(out2[0, -1])).max() > 1e-4


def test_hf_transformers_parity():
    """Logits match a real Hugging Face GPT2LMHeadModel bit-closely; the
    state dict loads with zero transposes (HF Conv1D is already (in, out))."""
    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    cfg = transformers.GPT2Config(
        vocab_size=V, n_positions=32, n_embd=D, n_layer=DEPTH, n_head=HEADS,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    hf = transformers.GPT2LMHeadModel(cfg).eval()
    model = GPT2(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                 dtype=jnp.float32)
    params = model.load_torch_state_dict(hf.state_dict())
    ids = np.random.default_rng(0).integers(0, V, size=(3, 17))
    with torch.no_grad():
        want = hf(torch.from_numpy(ids)).logits.numpy()
    got, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # bare GPT2Model keys (no "transformer." prefix) load too
    bare = {k.removeprefix("transformer."): v for k, v in hf.state_dict().items()
            if k.startswith("transformer.")}
    params2 = model.load_torch_state_dict(bare)
    got2, _ = model.apply(params2, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got2), want, atol=2e-5)


def test_from_name_and_limits():
    m = GPT2.from_name("gpt2-medium", dtype=jnp.float32)
    assert (m.width, m.depth, m.heads) == (1024, 24, 16)
    with pytest.raises(ValueError, match="gpt2"):
        GPT2.from_name("gpt3")
    tiny = GPT2(vocab_size=V, n_positions=8, width=16, depth=1, heads=2,
                dtype=jnp.float32)
    params = tiny.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="exceeds n_positions"):
        tiny.apply(params, jnp.zeros((1, 9), jnp.int32))


def test_attention_head_components(tiny_gpt):
    """The virtual "…attn.heads" tap is the norm of each head's
    residual-stream contribution: with W_O = identity (and zero bias) the
    contribution of head h is exactly its slice of the pre-merge attention
    output, so the tapped norms must equal the per-slice norms of the
    c_proj output."""
    model, params = tiny_gpt
    p = dict(params)
    p["transformer.h.0.attn.c_proj.weight"] = jnp.eye(D, dtype=jnp.float32)
    p["transformer.h.0.attn.c_proj.bias"] = jnp.zeros((D,), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, V, size=(2, T)))
    _, taps = model.apply(p, ids, tap_names=(
        "transformer.h.0.attn.heads", "transformer.h.0.attn.c_proj"))
    norms = np.asarray(taps["transformer.h.0.attn.heads"])
    assert norms.shape == (2, T, HEADS)
    assert (norms >= 0).all()
    merged = np.asarray(taps["transformer.h.0.attn.c_proj"], np.float32)
    hd = D // HEADS
    want = np.linalg.norm(merged.reshape(2, T, HEADS, hd), axis=-1)
    np.testing.assert_allclose(norms, want, rtol=1e-4, atol=1e-5)


def test_head_components_through_collect():
    """Heads flow through the standard pipeline: C = n_heads components."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_mean

    model = GPT2(vocab_size=V, n_positions=T, width=D, depth=1, heads=HEADS,
                 dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1))
    rows = np.random.default_rng(1).integers(0, V, size=(12, T), dtype=np.int32)
    eng = CollectEngine(model=model, layer_names=["transformer.h.0.attn.heads"],
                        aggregation_fn=aggregate_transformer_mean, n_collect=3,
                        input_preprocess=lambda x: x.astype(jnp.int32))
    states, n = eng.run(params, ArrayDataset(rows, name="toks"), batch_size=4)
    assert n == 12
    assert states["transformer.h.0.attn.heads"].values.shape == (HEADS, 3)


def test_left_padding_with_pad_id_matches_unpadded(tiny_gpt):
    """pad_id masks edge-pad runs out of attention and positions count real
    tokens: a left-padded row's real positions carry exactly the unpadded
    activations (the property that makes padded-corpus evidence valid)."""
    _, params = tiny_gpt
    model = GPT2(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                 dtype=jnp.float32, pad_id=0)
    toks = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    padded = jnp.asarray([[0, 0, 0, 0, 5, 6, 7, 8]], jnp.int32)
    layer = f"transformer.h.{DEPTH - 1}.mlp.act"
    o1, t1 = model.apply(params, toks, (layer,))
    o2, t2 = model.apply(params, padded, (layer,))
    np.testing.assert_array_equal(np.asarray(o1[0]), np.asarray(o2[0, 4:]))
    np.testing.assert_array_equal(
        np.asarray(t1[layer][0]), np.asarray(t2[layer][0, 4:]))
    assert np.isfinite(np.asarray(o2)).all()  # pad rows stay finite (self-attend)

    # a mid-text token equal to pad_id is NOT masked (edge runs only)
    mid = jnp.asarray([[5, 0, 7, 8]], jnp.int32)
    o_mid, _ = model.apply(params, mid, ())
    o_mid_nopad, _ = GPT2(vocab_size=V, n_positions=32, width=D, depth=DEPTH,
                          heads=HEADS, dtype=jnp.float32).apply(params, mid, ())
    np.testing.assert_array_equal(np.asarray(o_mid), np.asarray(o_mid_nopad))

    # without pad_id, left padding contaminates (the bug this guards)
    o3, _ = GPT2(vocab_size=V, n_positions=32, width=D, depth=DEPTH, heads=HEADS,
                 dtype=jnp.float32).apply(params, padded, ())
    assert np.abs(np.asarray(o1[0]) - np.asarray(o3[0, 4:])).max() > 1e-3
