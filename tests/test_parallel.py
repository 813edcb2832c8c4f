"""Tensor-parallel sharding tests on a virtual 2×4 (data × model) mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from semanticlens_tpu.foundation_models.clip import (
    CLIPConfig,
    TextCfg,
    VisionCfg,
    clip_encode_text,
    init_clip_params,
    vit_encode_image,
)
from semanticlens_tpu.parallel import clip_param_specs_2d, shard_clip_params

TINY = CLIPConfig(
    embed_dim=16,
    vision=VisionCfg(kind="vit", image_size=16, patch_size=8, width=64, layers=2, heads=4),
    text=TextCfg(context_length=12, vocab_size=64, width=64, heads=4, layers=2),
)


@pytest.fixture(scope="module")
def mesh2d():
    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devices, axis_names=("data", "model"))


def test_sharding_placement(mesh2d):
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    specs = clip_param_specs_2d(TINY)
    sharded = shard_clip_params(params, mesh2d, specs)

    w = sharded["visual.transformer.resblocks.0.attn.in_proj_weight"]
    assert w.sharding.spec == P(None, "model")
    # Replicated params stay replicated.
    assert sharded["visual.proj"].sharding.spec == P()


def test_tp_encode_matches_single_device(mesh2d):
    """GSPMD execution over (data, model) must equal unsharded execution."""
    params = init_clip_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    tokens = jnp.asarray(rng.integers(0, 64, size=(4, 12)), jnp.int32)

    ref_img = np.asarray(vit_encode_image(params, TINY, imgs))
    ref_txt = np.asarray(clip_encode_text(params, TINY, tokens))

    sharded = shard_clip_params(params, mesh2d, clip_param_specs_2d(TINY))
    imgs_s = jax.device_put(imgs, NamedSharding(mesh2d, P("data")))
    tokens_s = jax.device_put(tokens, NamedSharding(mesh2d, P("data")))

    tp_img = np.asarray(jax.jit(lambda p, x: vit_encode_image(p, TINY, x))(sharded, imgs_s))
    tp_txt = np.asarray(jax.jit(lambda p, t: clip_encode_text(p, TINY, t))(sharded, tokens_s))

    np.testing.assert_allclose(tp_img, ref_img, atol=1e-4)
    np.testing.assert_allclose(tp_txt, ref_txt, atol=1e-4)


def test_non_divisible_dims_fall_back_to_replication(mesh2d):
    cfg = CLIPConfig(
        embed_dim=16,
        vision=VisionCfg(kind="vit", image_size=16, patch_size=8, width=30, layers=1, heads=2),
        text=TextCfg(context_length=12, vocab_size=64, width=30, heads=2, layers=1),
    )
    params = init_clip_params(jax.random.PRNGKey(1), cfg)
    sharded = shard_clip_params(params, mesh2d, clip_param_specs_2d(cfg))
    # 3·30=90 not divisible by 4 → replicated, not an error.
    w = sharded["transformer.resblocks.0.attn.in_proj_weight"]
    assert w.sharding.spec == P()


def test_auto_tp_sharding_via_model_axis():
    """FMs tensor-shard automatically when the mesh has a 'model' axis."""
    import jax
    from jax.sharding import Mesh

    from semanticlens_tpu.foundation_models.clip import (
        CLIPConfig,
        TextCfg,
        VisionCfg,
        _maybe_shard_tp,
        init_clip_params,
        vit_encode_image,
    )

    tiny = CLIPConfig(
        embed_dim=16,
        vision=VisionCfg(kind="vit", image_size=16, patch_size=8, width=16, layers=2, heads=2),
        text=TextCfg(context_length=12, vocab_size=64, width=16, heads=2, layers=2),
    )
    params = init_clip_params(jax.random.PRNGKey(0), tiny)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16, 16, 3)).astype(np.float32))
    want = np.asarray(vit_encode_image(params, tiny, x))

    mesh2d = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), axis_names=("data", "model"))
    sharded = _maybe_shard_tp(params, tiny, mesh2d)
    key = "visual.transformer.resblocks.0.mlp.c_fc.weight"
    spec = sharded[key].sharding.spec
    assert tuple(spec) == (None, "model"), spec
    got = np.asarray(jax.jit(lambda p, x: vit_encode_image(p, tiny, x))(sharded, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # 1-D data mesh or model axis of size 1: no-op
    mesh1d = Mesh(np.array(jax.devices()[:8]), axis_names=("data",))
    assert _maybe_shard_tp(params, tiny, mesh1d) is params
    assert _maybe_shard_tp(params, tiny, None) is params


def test_llama_subject_tp_collect_matches_single_device(mesh2d):
    """dp×tp GSPMD collect on a Llama SUBJECT equals single-device collect.

    The engine's GSPMD path (CollectEngine with a "model" axis in the mesh):
    params carry Megatron shardings from llama_param_specs_2d, the batch
    shards on "data", and the replicated top-k state must come out with the
    same evidence ids (exact) and values (reduction-order tolerance)."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data.dataset import ArrayDataset
    from semanticlens_tpu.models import Llama
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_mean
    from semanticlens_tpu.parallel import llama_param_specs_2d, shard_params

    model = Llama(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                  kv_heads=2, intermediate=64, dtype=jnp.float32, pad_id=0)
    params = model.init(jax.random.PRNGKey(0))
    model.name = "tp-llama"
    rng = np.random.default_rng(3)
    rows = rng.integers(1, 61, size=(12, 8), dtype=np.int32)
    layers = ["model.layers.1.mlp.act_fn", "model.layers.0.self_attn.heads"]

    def run(mesh, p):
        eng = CollectEngine(model=model, layer_names=layers,
                            aggregation_fn=aggregate_transformer_mean,
                            n_collect=3, mesh=mesh,
                            input_preprocess=lambda x: x)
        states, n = eng.run(p, ArrayDataset(rows, name="toks"), batch_size=4)
        assert n == 12
        return states

    want = run(None, params)

    specs = llama_param_specs_2d(model)
    sharded = shard_params(params, mesh2d, specs)
    assert tuple(sharded["model.layers.0.self_attn.q_proj.weight"].sharding.spec) \
        == (None, "model")
    assert tuple(sharded["model.layers.0.self_attn.o_proj.weight"].sharding.spec) \
        == ("model", None)
    got = run(mesh2d, sharded)

    for name in layers:
        np.testing.assert_array_equal(
            np.asarray(got[name].ids), np.asarray(want[name].ids), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(got[name].values, np.float32),
            np.asarray(want[name].values, np.float32), rtol=2e-2, atol=1e-4,
            err_msg=name)


def test_gpt2_param_specs_place(mesh2d):
    from semanticlens_tpu.models import GPT2
    from semanticlens_tpu.parallel import gpt2_param_specs_2d, shard_params

    model = GPT2(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                 dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_params(params, mesh2d, gpt2_param_specs_2d(model))
    assert tuple(sharded["transformer.h.0.mlp.c_fc.weight"].sharding.spec) \
        == (None, "model")
    assert tuple(sharded["transformer.h.0.mlp.c_proj.weight"].sharding.spec) \
        == ("model", None)
    # norms/embeddings replicated
    assert sharded["transformer.wte.weight"].sharding.spec == P()


def test_gemma2_subject_tp_collect_matches_single_device(mesh2d):
    """llama_param_specs_2d covers Gemma subjects unchanged (same matmul
    param names; sandwich norms replicate) — dp×tp GSPMD collect on a
    Gemma-2 subject equals single-device collect, soft-caps and all."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data.dataset import ArrayDataset
    from semanticlens_tpu.models import Gemma2
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_mean
    from semanticlens_tpu.parallel import llama_param_specs_2d, shard_params

    model = Gemma2(vocab_size=61, n_positions=16, width=32, depth=2, heads=4,
                   kv_heads=2, head_dim=8, intermediate=64, sliding_window=5,
                   dtype=jnp.float32, pad_id=0)
    params = model.init(jax.random.PRNGKey(0))
    model.name = "tp-gemma2"
    rows = np.random.default_rng(4).integers(1, 61, size=(12, 8), dtype=np.int32)
    layers = ["model.layers.1.mlp.act_fn", "model.layers.0.self_attn.heads"]

    def run(mesh, p):
        eng = CollectEngine(model=model, layer_names=layers,
                            aggregation_fn=aggregate_transformer_mean,
                            n_collect=3, mesh=mesh,
                            input_preprocess=lambda x: x)
        states, n = eng.run(p, ArrayDataset(rows, name="toks"), batch_size=4)
        assert n == 12
        return states

    want = run(None, params)
    sharded = shard_params(params, mesh2d, llama_param_specs_2d(model))
    assert tuple(sharded["model.layers.0.mlp.gate_proj.weight"].sharding.spec) \
        == (None, "model")
    assert sharded["model.layers.0.post_feedforward_layernorm.weight"].sharding.spec == P()
    got = run(mesh2d, sharded)
    for name in layers:
        np.testing.assert_array_equal(
            np.asarray(got[name].ids), np.asarray(want[name].ids), err_msg=name)
        np.testing.assert_allclose(
            np.asarray(got[name].values, np.float32),
            np.asarray(want[name].values, np.float32), rtol=2e-2, atol=1e-4,
            err_msg=name)
