"""On-device streaming top-k state for the Collect stage.

The reference keeps a per-layer running top-k on the **host**, updated from a
forward hook per layer per batch (reference:
semanticlens/component_visualization/activation_caching.py:101-141) — a
device→host round trip for every (layer, batch). Here the state is a pytree
that lives in HBM and is donated through a jitted update, so the whole
Collect hot loop [forward → aggregate → top-k merge] compiles into one XLA
program with zero host syncs.

Semantics match the reference exactly for parity of cached artifacts:

- values are bf16, initialized to 0.0 → negative activations never displace
  an unfilled slot (reference activation_caching.py:108);
- ids are initialized to −1 sentinels (activation_caching.py:109);
- merge = concat([state, batch]) → top-k → gather ids
  (activation_caching.py:133-141), state entries win ties because they come
  first in the concat and ``lax.top_k`` is stable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class TopKState(NamedTuple):
    """Running top-k for one layer: (n_latents, k) values + sample ids."""

    values: jax.Array  # (C, k) bfloat16, descending per row
    ids: jax.Array  # (C, k) int32, −1 for unfilled slots


def init_topk(n_latents: int, n_collect: int) -> TopKState:
    """Fresh state: 0.0-valued slots with −1 sample ids."""
    return TopKState(
        values=jnp.zeros((n_latents, n_collect), jnp.bfloat16),
        ids=jnp.full((n_latents, n_collect), -1, jnp.int32),
    )


def topk_update(state: TopKState, acts: jax.Array, sample_ids: jax.Array) -> TopKState:
    """Merge a batch of aggregated activations into the running top-k.

    Parameters
    ----------
    state : TopKState with values (C, k).
    acts : (B, C) aggregated activations (any float dtype; cast to bf16).
    sample_ids : (B,) int32 global dataset indices of the batch rows.

    Pure function — safe inside jit/scan/shard_map; donate ``state`` at the
    jit boundary to update in place.
    """
    k = state.values.shape[1]
    batch_vals = acts.T.astype(jnp.bfloat16)  # (C, B)
    batch_ids = jnp.broadcast_to(sample_ids.astype(jnp.int32)[None, :], batch_vals.shape)

    all_vals = jnp.concatenate([state.values, batch_vals], axis=1)
    all_ids = jnp.concatenate([state.ids, batch_ids], axis=1)

    # top_k on bf16 keeps the comparison semantics of the stored dtype,
    # matching the reference which stores and compares in bf16.
    new_vals, idx = jax.lax.top_k(all_vals, k)
    new_ids = jnp.take_along_axis(all_ids, idx, axis=1)
    return TopKState(values=new_vals, ids=new_ids)


def topk_merge(states: TopKState) -> TopKState:
    """Merge per-shard top-k states into one global state.

    ``states`` holds stacked per-device results with a leading shard axis:
    values (D, C, k). The merge concatenates candidates along k and re-selects
    — the cross-shard reduction for data-parallel Collect (runs once at
    finalization, after the per-shard scans; see SURVEY.md §2).

    Tie-break is "value desc, sample-id asc": the single-device streaming
    path (and the reference's stable CPU topk over [state, batch]) always
    prefers earlier samples on equal values, so the cross-shard merge must
    too — otherwise sharded and unsharded runs diverge on bf16 ties.

    Sentinel semantics (deliberate, pinned by tests/ops/test_topk.py): an
    unfilled slot is (value 0.0, id −1), and −1 sorts before every real id,
    so **a sentinel wins an exact-0.0 tie against a real sample**. This
    matches the single-device streaming path, where the state (sentinels
    included) precedes the batch in the stable top-k concat — i.e. a real
    activation of exactly 0.0 never displaces an empty slot there either,
    which is the reference's behavior as well (its values also start at 0.0
    and its stored state comes first). Sharded and unsharded sweeps therefore
    produce identical ids even on degenerate all-zero latents.
    """
    d, c, k = states.values.shape
    all_vals = jnp.transpose(states.values, (1, 0, 2)).reshape(c, d * k)
    all_ids = jnp.transpose(states.ids, (1, 0, 2)).reshape(c, d * k)

    # Two stable sorts = lexicographic (value desc, id asc).
    order_by_id = jnp.argsort(all_ids, axis=1, stable=True)
    vals_i = jnp.take_along_axis(all_vals, order_by_id, axis=1)
    ids_i = jnp.take_along_axis(all_ids, order_by_id, axis=1)
    order_by_val = jnp.argsort(-vals_i.astype(jnp.float32), axis=1, stable=True)
    new_vals = jnp.take_along_axis(vals_i, order_by_val, axis=1)[:, :k]
    new_ids = jnp.take_along_axis(ids_i, order_by_val, axis=1)[:, :k]
    return TopKState(values=new_vals, ids=new_ids)


@functools.partial(jax.jit, donate_argnums=0)
def topk_update_jit(state: TopKState, acts: jax.Array, sample_ids: jax.Array) -> TopKState:
    """Standalone jitted update with donated state (for host-driven loops)."""
    return topk_update(state, acts, sample_ids)


def alive_latents(state: TopKState) -> jax.Array:
    """Indices of latents with any non-zero collected activation.

    Reference: activation_caching.py:143-156.
    """
    mask = jnp.sum(jnp.abs(state.values.astype(jnp.float32)), axis=1) > 0
    return jnp.where(mask)[0]
