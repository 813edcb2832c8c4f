"""Streaming top-k state semantics, incl. the sentinel tie-break contract.

The reference keeps a host-side running top-k whose values start at 0.0 and
whose stored state precedes each batch in a stable top-k
(reference activation_caching.py:101-141); these tests pin that our
device-resident state and the cross-shard merge reproduce those semantics
exactly — in particular on exact-0.0 ties against unfilled (-1) slots.
"""

import numpy as np
import jax.numpy as jnp

from semanticlens_tpu.ops.topk import (
    TopKState,
    alive_latents,
    init_topk,
    topk_merge,
    topk_update,
)


def _stream(n_latents, k, acts, ids, batch=None):
    """Single-device streaming oracle path: repeated topk_update."""
    state = init_topk(n_latents, k)
    batch = batch or len(ids)
    for s in range(0, len(ids), batch):
        state = topk_update(
            state,
            jnp.asarray(acts[s : s + batch]),
            jnp.asarray(ids[s : s + batch], jnp.int32),
        )
    return state


def test_streaming_matches_full_sort_oracle():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(40, 6)).astype(np.float32)
    ids = np.arange(40, dtype=np.int32)
    state = _stream(6, 5, acts, ids, batch=8)

    bf16 = jnp.asarray(acts, jnp.bfloat16)  # state compares in bf16
    per_latent = np.asarray(bf16.astype(jnp.float32)).T  # (C, N)
    for c in range(6):
        order = np.argsort(-per_latent[c], kind="stable")[:5]
        np.testing.assert_array_equal(np.asarray(state.ids)[c], ids[order])


def test_zero_activation_does_not_displace_sentinel_single_device():
    # k=4 but only 2 samples, one of which activates at exactly 0.0:
    # the 0.0 sample must lose to the pre-existing (0.0, -1) sentinel slots.
    acts = np.array([[0.0], [1.0]], np.float32)
    state = _stream(1, 4, acts, np.array([7, 8], np.int32))
    row = np.asarray(state.ids)[0]
    assert row[0] == 8
    assert (row[1:] == -1).all(), f"real 0.0 displaced a sentinel: {row}"


def test_cross_shard_merge_matches_single_device_on_zero_ties():
    # Two shards, each half-filled with exact-0.0 activations. The merge must
    # agree with an unsharded streaming run over the same samples.
    k = 4
    shard_a = _stream(1, k, np.array([[0.0], [0.5]], np.float32), np.array([0, 1], np.int32))
    shard_b = _stream(1, k, np.array([[0.0], [0.25]], np.float32), np.array([2, 3], np.int32))
    merged = topk_merge(
        TopKState(
            values=jnp.stack([shard_a.values, shard_b.values]),
            ids=jnp.stack([shard_a.ids, shard_b.ids]),
        )
    )
    single = _stream(
        1, k, np.array([[0.0], [0.5], [0.0], [0.25]], np.float32), np.arange(4, dtype=np.int32)
    )
    np.testing.assert_array_equal(np.asarray(merged.ids), np.asarray(single.ids))
    np.testing.assert_array_equal(
        np.asarray(merged.values, np.float32), np.asarray(single.values, np.float32)
    )
    # And pin the semantics explicitly: sentinels win the 0.0 ties.
    np.testing.assert_array_equal(np.asarray(merged.ids)[0], [1, 3, -1, -1])


def test_cross_shard_merge_prefers_earlier_id_on_real_ties():
    k = 2
    shard_a = _stream(1, k, np.array([[2.0]], np.float32), np.array([10], np.int32))
    shard_b = _stream(1, k, np.array([[2.0]], np.float32), np.array([3], np.int32))
    merged = topk_merge(
        TopKState(
            values=jnp.stack([shard_a.values, shard_b.values]),
            ids=jnp.stack([shard_a.ids, shard_b.ids]),
        )
    )
    np.testing.assert_array_equal(np.asarray(merged.ids)[0], [3, 10])


def test_alive_latents_ignores_sentinel_only_rows():
    state = _stream(3, 2, np.array([[1.0, 0.0, -1.0]], np.float32), np.array([0], np.int32))
    alive = np.asarray(alive_latents(state))
    # latent 0 has a positive hit; latent 1 is exactly 0; latent 2 is negative
    # and never displaced the 0.0 sentinel — both read as dead, like the
    # reference's abs-sum > 0 rule.
    np.testing.assert_array_equal(alive, [0])
