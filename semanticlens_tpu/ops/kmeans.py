"""Batched, seeded k-means on device.

The reference computes polysemanticity with a per-neuron Python loop over
sklearn ``KMeans(n_clusters=2, n_init=10, random_state=123)`` on the host
(reference: semanticlens/scores.py:167) — its slowest score. Here the whole
thing is one ``vmap``-ed, ``jit``-ed routine: every neuron's k-means runs as a
batched distance-matmul on the MXU, n_init restarts evaluated in parallel.

Bit-exact parity with sklearn is unattainable (different PRNG streams); the
parity target is score tolerance (see SURVEY.md §5). The algorithm matches
sklearn's: k-means++ initialization, Lloyd iterations, best-inertia restart
selection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kmeanspp_init(key, x, k, n_local_trials: int = 2):
    """k-means++ seeding with greedy local trials (sklearn's algorithm).

    First center uniform; each subsequent center is the best of
    ``n_local_trials`` candidates sampled ∝ squared distance to the nearest
    chosen center, where "best" minimizes the resulting potential — matching
    sklearn's ``_kmeans_plusplus`` (n_local_trials = 2 + ⌊log k⌋ = 2 for k=2).

    x: (n, d) float32. Returns (k, d) initial centers.
    """
    n = x.shape[0]
    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]
    d2 = jnp.sum((x - first[None, :]) ** 2, axis=-1)  # closest-center distances

    def pick_next(carry, key_i):
        centers, d2, n_chosen = carry
        probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
        cand_idx = jax.random.choice(key_i, n, shape=(n_local_trials,), p=probs)
        cand = x[cand_idx]  # (t, d)
        # Potential if each candidate were added: sum of min(d2, dist-to-cand).
        cand_d2 = jnp.sum((x[None, :, :] - cand[:, None, :]) ** 2, axis=-1)  # (t, n)
        new_d2 = jnp.minimum(d2[None, :], cand_d2)  # (t, n)
        best = jnp.argmin(jnp.sum(new_d2, axis=1))
        centers = centers.at[n_chosen].set(cand[best])
        return (centers, new_d2[best], n_chosen + 1), None

    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)
    keys = jax.random.split(key, k - 1)
    (centers, _, _), _ = jax.lax.scan(pick_next, (centers0, d2, 1), keys)
    return centers


def _lloyd(x, centers, max_iters, tol):
    """Lloyd iterations until center shift < tol or max_iters."""

    def assign(centers):
        # Squared distances via the expanded form: the x·cᵀ term is an MXU matmul.
        d2 = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * x @ centers.T
            + jnp.sum(centers * centers, axis=1)[None, :]
        )
        return jnp.argmin(d2, axis=1)

    def body(state):
        centers, _, i = state
        labels = assign(centers)
        one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype)  # (n, k)
        counts = jnp.sum(one_hot, axis=0)  # (k,)
        sums = one_hot.T @ x  # (k, d)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        shift = jnp.sum((new_centers - centers) ** 2)
        return new_centers, shift, i + 1

    def cond(state):
        _, shift, i = state
        return jnp.logical_and(shift > tol, i < max_iters)

    centers, _, _ = jax.lax.while_loop(cond, body, (centers, jnp.inf, 0))
    labels = assign(centers)
    one_hot = jax.nn.one_hot(labels, centers.shape[0], dtype=x.dtype)
    counts = jnp.sum(one_hot, axis=0)
    # Final center update to be consistent with final labels.
    sums = one_hot.T @ x
    centers = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers)
    d2 = jnp.sum((x - centers[labels]) ** 2, axis=1)
    inertia = jnp.sum(d2)
    return centers, labels, counts, inertia


def _best_of_n(key, x, k, n_init, max_iters, tol):
    """n_init k-means++ restarts in parallel; best-inertia run wins."""
    keys = jax.random.split(key, n_init)

    def one_run(key):
        init = _kmeanspp_init(key, x, k)
        return _lloyd(x, init, max_iters, tol)

    centers, labels, counts, inertias = jax.vmap(one_run)(keys)
    best = jnp.argmin(inertias)
    return centers[best], labels[best], counts[best]


@functools.partial(jax.jit, static_argnames=("k", "n_init", "max_iters"))
def kmeans(x, k: int = 2, *, n_init: int = 10, max_iters: int = 300, seed: int = 123, tol: float = 1e-8):
    """Seeded k-means for a single point set.

    Parameters
    ----------
    x : (n, d) array. Cast to float32 internally.
    k : number of clusters.
    n_init : independent k-means++ restarts; the best-inertia run wins.

    Returns
    -------
    centers : (k, d) float32
    labels : (n,) int32
    counts : (k,) float32 — cluster sizes under the final assignment.
    """
    return _best_of_n(jax.random.PRNGKey(seed), x.astype(jnp.float32), k, n_init, max_iters, tol)


@functools.partial(jax.jit, static_argnames=("k", "n_init", "max_iters"))
def batched_kmeans(V, k: int = 2, *, n_init: int = 10, max_iters: int = 300, seed: int = 123):
    """Run seeded k-means independently over the leading axis of ``V``.

    V : (m, n, d). Returns centers (m, k, d), labels (m, n), counts (m, k).

    Replaces the reference's per-neuron host loop over sklearn
    (semanticlens/scores.py:167) with one device-resident vmap.
    """

    def per_row(x, row_seed):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), row_seed)
        return _best_of_n(key, x.astype(jnp.float32), k, n_init, max_iters, 1e-8)

    return jax.vmap(per_row)(V, jnp.arange(V.shape[0]))
