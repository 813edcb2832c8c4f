"""Property-based fuzz for the round-3 subsystems.

Randomized shapes/topologies catch the off-by-one and tiling classes that
fixed-size unit tests miss (the round-2 F-order safetensors bug was found
exactly this way, tests/test_layout_safety.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_grain_equals_memory_path(trial):
    """Random (n, pc, batch): every grain shard swept and merged must equal
    the single in-memory sweep — ids AND values."""
    pytest.importorskip("grain")
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.data.grain_adapter import GrainShardDataset
    from semanticlens_tpu.models.base import SubjectModel, TapCollector
    from semanticlens_tpu.models.layers import conv2d
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.topk import TopKState, topk_merge

    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(3, 40))
    pc = int(rng.integers(1, 5))
    batch = int(rng.integers(1, 7))
    k = int(rng.integers(1, 6))

    class OneConv(SubjectModel):
        module_names = ("c",)

        def apply(self, params, x, tap_names=()):
            tap = TapCollector(tap_names)
            return tap("c", conv2d(x, params["w"])), tap.taps

    params = {"w": jnp.asarray(rng.normal(size=(1, 1, 3, 4)).astype(np.float32))}
    images = rng.normal(size=(n, 6, 6, 3)).astype(np.float32)
    ds = ArrayDataset(images, name=f"fz{trial}")
    mk = lambda: CollectEngine(
        model=OneConv(), layer_names=("c",), aggregation_fn=aggregate_conv_mean, n_collect=k
    )
    ref, _ = mk().run(params, ds, batch)

    shard_states = []
    for pi in range(pc):
        gds = GrainShardDataset(images, transform=lambda r: np.asarray(r, np.float32),
                                name="g", process_index=pi, process_count=pc)
        if len(gds) == 0:
            continue
        states, seen = mk().run(params, gds, batch, id_offset=gds.start)
        assert seen == len(gds)
        shard_states.append(states["c"])

    merged = topk_merge(
        TopKState(
            values=jnp.stack([s.values for s in shard_states]),
            ids=jnp.stack([s.ids for s in shard_states]),
        )
    )
    np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(ref["c"].ids),
                                  err_msg=f"n={n} pc={pc} batch={batch} k={k}")
    np.testing.assert_array_equal(
        np.asarray(merged.values, np.float32), np.asarray(ref["c"].values, np.float32)
    )


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_soft_wpmi_invariances(trial):
    """Random shapes: vocab permutation equivariance, sentinel-padding
    invariance, and embedding-scale invariance (cosine-based)."""
    from semanticlens_tpu.scores import soft_wpmi

    rng = np.random.default_rng(200 + trial)
    n, v, d = int(rng.integers(6, 30)), int(rng.integers(2, 9)), int(rng.integers(4, 12))
    c, k = int(rng.integers(1, 5)), int(rng.integers(1, 5))
    vocab = rng.normal(size=(v, d)).astype(np.float32)
    imgs = rng.normal(size=(n, d)).astype(np.float32)
    ids = rng.integers(-1, n, size=(c, k))

    base = soft_wpmi(vocab, imgs, ids)
    assert base.shape == (c, v) and np.isfinite(base).all()

    perm = rng.permutation(v)
    np.testing.assert_allclose(soft_wpmi(vocab[perm], imgs, ids), base[:, perm], atol=1e-4)

    padded = np.concatenate([ids, np.full((c, 3), -1, ids.dtype)], axis=1)
    np.testing.assert_allclose(soft_wpmi(vocab, imgs, padded), base, atol=1e-4)

    np.testing.assert_allclose(soft_wpmi(vocab * 7.5, imgs * 0.3, ids), base, atol=1e-3)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_lrp_block_conservation(trial):
    """Random widths/tokens/batch: the ε composite conserves through a full
    pre-LN transformer block (bias-free)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "collect"))
    from test_relevance_based import _conservation, _vit_block_apply, _vit_block_params

    rng = np.random.default_rng(300 + trial)
    heads = int(rng.integers(1, 4))
    w = int(rng.integers(2, 6)) * heads * 2
    t = int(rng.integers(2, 12))
    b = int(rng.integers(1, 4))
    x = jnp.asarray(rng.normal(size=(b, t, w)).astype(np.float32))
    p = _vit_block_params(jax.random.PRNGKey(trial), w)
    r_in, r_out = _conservation(lambda xx: _vit_block_apply(p, xx, heads=heads), x)
    assert abs(r_in - r_out) <= 2e-3 * max(abs(r_out), 1.0), (trial, w, t, b, r_in, r_out)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_text_collect_matches_bruteforce(trial):
    """Random (n, T, batch, k): the engine's token-batch top-k (int32 input
    path, bf16 state) must equal a brute-force numpy pass — values bf16-
    identical, ids identical wherever the bf16 value is unique."""
    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models import GPT2
    from semanticlens_tpu.ops.aggregators import aggregate_transformer_mean

    rng = np.random.default_rng(200 + trial)
    n = int(rng.integers(6, 28))
    t = int(rng.integers(3, 9))
    batch = int(rng.integers(2, 6))
    k = int(rng.integers(2, 5))
    v, d = 31, 8
    tokens = rng.integers(0, v, size=(n, t), dtype=np.int64)

    model = GPT2(vocab_size=v, n_positions=16, width=d, depth=1, heads=2,
                 dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(trial))
    layer = "transformer.h.0.mlp.act"

    eng = CollectEngine(model=model, layer_names=[layer],
                        aggregation_fn=aggregate_transformer_mean, n_collect=k,
                        input_preprocess=lambda x: x.astype(jnp.int32))
    states, seen = eng.run(params, ArrayDataset(tokens, name=f"fuzz{trial}"),
                           batch_size=batch)
    assert seen == n
    got_vals = np.asarray(states[layer].values, np.float32)
    got_ids = np.asarray(states[layer].ids)

    _, taps = model.apply(params, jnp.asarray(tokens, jnp.int32), (layer,))
    agg = np.asarray(aggregate_transformer_mean(taps[layer]), np.float32)
    agg16 = agg.astype(jnp.bfloat16).astype(np.float32)  # state rounds to bf16
    # reference quirk parity: slots initialize to 0.0 bf16 with id −1, so the
    # merged top-k is over {k zero-sentinels} ∪ {candidates} — all-negative
    # components keep sentinel slots
    cand = np.concatenate([agg16.T, np.zeros((agg16.shape[1], k), np.float32)], axis=1)
    cand_ids = np.concatenate(
        [np.tile(np.arange(n), (agg16.shape[1], 1)),
         np.full((agg16.shape[1], k), -1)], axis=1)
    order = np.argsort(-cand, axis=1, kind="stable")[:, :k]
    want_vals = np.take_along_axis(cand, order, axis=1)
    want_ids = np.take_along_axis(cand_ids, order, axis=1)

    np.testing.assert_array_equal(got_vals, want_vals)
    unique = np.array([
        [want_vals[c, j] != 0.0 and np.sum(agg16[:, c] == want_vals[c, j]) == 1
         for j in range(k)]
        for c in range(agg16.shape[1])
    ])
    np.testing.assert_array_equal(got_ids[unique], want_ids[unique])
