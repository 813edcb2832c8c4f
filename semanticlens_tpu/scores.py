"""Concept-quality scores as fused, jittable JAX functions.

TPU-native re-implementation of the Analyze stage of SemanticLens
(reference: semanticlens/scores.py:18-185). All scores are pure functions of
arrays; they run as fused matmul/reduction XLA programs on device. Inputs may
be numpy arrays, JAX arrays, or dicts thereof (dict dispatch lives in
:class:`semanticlens_tpu.lens.Lens`).

Numerical conventions match the reference exactly:

- ``clarity_score``: unbiased mean pairwise cosine similarity computed via
  ``‖mean(normalized)‖²`` with the n/(n−1) correction
  (reference scores.py:46).
- ``redundancy_score``: pairwise cosine matrix with diagonal suppressed by
  ``−2·I``, per-row max, then mean over rows (reference scores.py:76-81).
- ``similarity_score``: shape-dispatching cosine (reference scores.py:119-128).
- ``polysemanticity_score``: 1 − clarity of per-neuron 2-means cluster
  centers, with the empty-cluster fallback (reference scores.py:164-185) —
  but the clustering is a batched on-device k-means instead of a host loop.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from semanticlens_tpu.ops.kmeans import batched_kmeans

logger = logging.getLogger(__name__)

__all__ = [
    "clarity_score",
    "redundancy_score",
    "similarity_score",
    "cosine_probe",
    "polysemanticity_score",
    "null_calibrated_polysemanticity",
    "topk_cosine_search",
    "soft_wpmi",
    "fastcav",
    "drift_score",
    "match_components",
    "semantic_coverage",
]


def _normalize(x, axis=-1, eps=1e-12):
    """L2-normalize along ``axis`` (torch.nn.functional.normalize semantics)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def _inv_norm(x, eps=1e-12):
    """1/max(‖row‖, eps) along the last axis."""
    return 1.0 / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _cosine_matrix(x, y_t):
    """cos(x_i, y_j) as matmul-then-rescale — mathematically identical to
    normalize-then-matmul but avoids materializing normalized copies of both
    operands in HBM (the dot's scaling epilogue fuses)."""
    dots = jnp.matmul(x, y_t, precision=jax.lax.Precision.HIGHEST)
    return dots * _inv_norm(x) * jnp.swapaxes(_inv_norm(jnp.swapaxes(y_t, -1, -2)), -1, -2)


@jax.jit
def clarity_score(V):
    """Clarity of each concept: how uniform its example embeddings are.

    Parameters
    ----------
    V : array of shape (..., n_samples, n_features)
        Concept tensor; typically (n_neurons, n_samples, n_features).

    Returns
    -------
    array of shape (...,) with values in [−1/(n_samples−1), 1].
    """
    V = jnp.asarray(V, jnp.float32)
    V_nrmed = _normalize(V, axis=-1)
    n = V.shape[-2]
    mean_embed = jnp.mean(V_nrmed, axis=-2)
    return (jnp.sum(mean_embed**2, axis=-1) - 1.0 / n) / (n - 1) * n


@jax.jit
def redundancy_score(cones):
    """Redundancy across components: mean of per-row max off-diagonal cosine.

    Parameters
    ----------
    cones : array of shape (..., n_components, n_features).

    Returns
    -------
    Scalar for 2-D input, (...,) for higher-rank input — matching the
    reference's observed behavior (semanticlens/scores.py:76-81).
    """
    cones = jnp.asarray(cones, jnp.float32)
    sims = _cosine_matrix(cones, jnp.swapaxes(cones, -1, -2))
    sims = sims - 2.0 * jnp.eye(sims.shape[-1], dtype=sims.dtype)
    return jnp.max(sims, axis=-1).mean(axis=-1)


def similarity_score(x, y):
    """Cosine similarity with the reference's shape dispatch.

    - different shapes, ``x.shape[1] == y.shape[0]``: ``x̂ @ ŷ``
    - different shapes, ``x.shape[1] == y.shape[1]``: ``x̂ @ ŷᵀ``
    - equal shapes: elementwise cosine along the last axis.
    """
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    if x.shape != y.shape:
        if x.shape[1] == y.shape[0]:
            if y.shape[0] == y.shape[1]:
                # Ambiguous square y: the reference's dispatch (scores.py:122)
                # would take this branch and compute x̂ @ ŷ with ŷ
                # ROW-normalized — garbage whenever y is actually a
                # (components, features) DB whose component count equals the
                # embedding dim. Probing callers should use
                # :func:`cosine_probe`, which has unambiguous semantics.
                logger.warning(
                    "similarity_score: y is square (%s); interpreting as x @ y "
                    "(reference dispatch). If y is a (components, features) "
                    "concept DB, use cosine_probe / pass y transposed.",
                    y.shape,
                )
            # Reference quirk kept verbatim (scores.py:122-123): x̂ @ ŷ with ŷ
            # row-normalized — only the x-side is a true cosine here.
            return jnp.matmul(
                _normalize(x, -1), _normalize(y, -1), precision=jax.lax.Precision.HIGHEST
            )
        elif x.shape[1] == y.shape[1]:
            return _cosine_matrix(x, y.T)
        raise ValueError("x and y must have the same shape")
    return jnp.sum(_normalize(x, -1) * _normalize(y, -1), axis=-1)


def cosine_probe(queries, concept_db):
    """Cosine similarity of (Q, D) queries against a (C, D) concept DB → (Q, C).

    Shape-unambiguous probing primitive: unlike ``similarity_score`` (whose
    reference-parity dispatch misfires when C == D), the layouts are fixed by
    contract. Used by all probing paths.
    """
    queries = jnp.asarray(queries, jnp.float32)
    concept_db = jnp.asarray(concept_db, jnp.float32)
    if queries.shape[-1] != concept_db.shape[-1]:
        raise ValueError(
            f"feature dims differ: queries {queries.shape} vs concept_db {concept_db.shape}"
        )
    return _cosine_matrix(queries, concept_db.T)


@functools.partial(jax.jit, static_argnames=("replace_empty_clusters", "random_state", "n_clusters"))
def polysemanticity_score(V, replace_empty_clusters: bool = True, random_state: int = 123, n_clusters: int = 2):
    """Polysemanticity of each concept: 1 − clarity of its 2-means centers.

    Parameters
    ----------
    V : array of shape (n_neurons, n_samples, n_features).

    Notes
    -----
    The reference clusters per neuron with seeded sklearn KMeans on the host
    (semanticlens/scores.py:167); parity is tolerance-based, not bit-exact
    (SURVEY.md §5). The empty-cluster fallback replicates reference
    scores.py:173-184: neurons whose smallest cluster has < 2 members get
    ``1 − mean_i clarity([mean(V), V[:, i]])`` over the first ≤10 samples.
    """
    V = jnp.asarray(V, jnp.float32)
    centers, _, counts = batched_kmeans(V, n_clusters, n_init=10, seed=random_state)
    poly = 1.0 - clarity_score(centers)

    if replace_empty_clusters:
        degenerate = jnp.min(counts, axis=-1) < 2  # (n_neurons,)
        num_samples = min(10, V.shape[1])
        v_mean = jnp.mean(V, axis=1)  # (m, d)
        clarity_not = jnp.zeros(V.shape[0], jnp.float32)
        for i in range(num_samples):
            pair = jnp.stack([v_mean, V[:, i]], axis=1)  # (m, 2, d)
            clarity_not = clarity_not + clarity_score(pair)
        fallback = 1.0 - clarity_not / num_samples
        poly = jnp.where(degenerate, fallback, poly)
    return poly


@functools.lru_cache(maxsize=None)
def _topk_merge_step(k: int):
    """Jitted chunk step for :func:`topk_cosine_search`, memoized per k."""

    @functools.partial(jax.jit, donate_argnums=(0, 1), static_argnums=5)
    def step(best_vals, best_idx, qn, chunk, chunk_start, chunk_rows):
        sim = jnp.matmul(
            qn, _normalize(chunk).T, precision=jax.lax.Precision.HIGHEST
        )  # (Q, C)
        col = chunk_start + jnp.arange(sim.shape[1], dtype=jnp.int32)
        sim = jnp.where(col[None, :] < chunk_start + chunk_rows, sim, -jnp.inf)
        all_vals = jnp.concatenate([best_vals, sim], axis=1)
        all_idx = jnp.concatenate(
            [best_idx, jnp.broadcast_to(col[None, :], sim.shape)], axis=1
        )
        new_vals, sel = jax.lax.top_k(all_vals, k)
        return new_vals, jnp.take_along_axis(all_idx, sel, axis=1)

    return step


def topk_cosine_search(queries, components, k: int, *, chunk_size: int = 65536):
    """Per-query top-k most-similar components WITHOUT materializing (Q, N).

    The full-audit configuration probes every layer's component bank — up to
    millions of rows — where the dense (Q, N) similarity matrix would blow
    HBM. This streams ``components`` through a jitted
    [normalize → matmul → running-top-k] step: peak memory is
    O(Q·(k + chunk_size)), one pass, state donated between chunks.

    Returns ``(values (Q, k) float32 desc, indices (Q, k) int32)`` — indices
    are global component row numbers. Exact (not approximate): equal to
    ``top_k(cosine_matrix(queries, components))`` (tested).
    """
    queries = jnp.asarray(queries, jnp.float32)
    components = jnp.asarray(components, jnp.float32)
    q = queries.shape[0]
    n = components.shape[0]
    if k > n:
        raise ValueError(f"k={k} exceeds component count {n}")
    chunk_size = min(chunk_size, max(n, 1))

    qn = _normalize(queries)
    best_vals = jnp.full((q, k), -jnp.inf, jnp.float32)
    best_idx = jnp.full((q, k), -1, jnp.int32)
    step = _topk_merge_step(k)

    for start in range(0, n, chunk_size):
        stop = min(start + chunk_size, n)
        chunk = components[start:stop]
        if stop - start < chunk_size:  # static-shape pad for the jitted step
            chunk = jnp.concatenate(
                [chunk, jnp.ones((chunk_size - (stop - start), chunk.shape[1]), chunk.dtype)]
            )
        best_vals, best_idx = step(
            best_vals, best_idx, qn, chunk, jnp.int32(start), stop - start
        )
    return best_vals, best_idx


def class_composition(sample_ids, labels, n_classes: int | None = None):
    """Per-component class histogram of the collected top-k evidence.

    The native answer to crp's per-target ``Statistics`` handler, which the
    reference constructs but never surfaces (reference relevance_based.py:145
    — the path is marked broken upstream): given the (C, k) top sample ids a
    Collect sweep produced and the dataset's labels, report which classes
    each component's evidence comes from.

    Parameters
    ----------
    sample_ids : (C, k) int array; −1 sentinels (unfilled slots) are ignored.
    labels : (N,) int dataset labels indexed by sample id.
    n_classes : histogram width; inferred as ``labels.max()+1`` when None.

    Returns
    -------
    counts : (C, n_classes) int32 — evidence count per class.
    purity : (C,) float32 — max class share per component (0 for components
        with no evidence). A purity near 1 means the component's top samples
        all come from one class — a class-selective unit.
    """
    ids = np.asarray(sample_ids)
    labels = np.asarray(labels)
    if n_classes is None:
        n_classes = int(labels.max()) + 1 if labels.size else 1
    c, _k = ids.shape
    counts = np.zeros((c, n_classes), np.int32)
    valid = ids >= 0
    rows, cols = np.nonzero(valid)
    np.add.at(counts, (rows, labels[ids[rows, cols]]), 1)
    totals = counts.sum(axis=1)
    purity = np.where(totals > 0, counts.max(axis=1) / np.maximum(totals, 1), 0.0).astype(
        np.float32
    )
    return counts, purity


@functools.partial(jax.jit, static_argnames=("lam", "p_start", "p_end"))
def _wpmi_chunk(P, Pbar, ids_chunk, *, lam, p_start, p_end):
    """(c, k) evidence ids → (c, V) soft-WPMI scores for one component chunk.

    ``P`` (N, V): p(word | image) softmax table; ``Pbar`` (V,): dataset-mean
    word probability. Rank weights α decay ``p_start → p_end`` over each
    row's VALID slots (not the table width), so −1 sentinels carry zero
    weight AND padding a row with extra sentinel columns leaves its score
    unchanged.
    """
    valid = (ids_chunk >= 0).astype(jnp.float32)  # (c, k)
    v = jnp.sum(valid, axis=1)  # (c,) valid counts
    r = jnp.arange(ids_chunk.shape[1], dtype=jnp.float32)
    a = (p_start + (p_end - p_start) * r[None, :] / jnp.maximum(v - 1.0, 1.0)[:, None]) * valid
    gathered = P[jnp.maximum(ids_chunk, 0)]  # (c, k, V)
    terms = jnp.log(jnp.clip(1.0 - a[..., None] + a[..., None] * gathered, 1e-7, None))
    log_p_d_given_w = jnp.sum(terms, axis=1)  # (c, V)
    # penalty: the same soft-OR against the dataset-average word probability —
    # a word no more likely on the evidence than on average scores ≈ 0.
    abar = jnp.sum(a, axis=1) / jnp.maximum(v, 1.0)  # (c,)
    pbar_row = 1.0 - abar[:, None] + abar[:, None] * Pbar[None, :]  # (c, V)
    log_p_d = v[:, None] * jnp.log(jnp.clip(pbar_row, 1e-7, None))
    return log_p_d_given_w - lam * log_p_d


def soft_wpmi(
    vocab_embeds,
    image_embeds,
    evidence_ids,
    *,
    temperature: float = 10.0,
    lam: float = 1.0,
    p_start: float = 0.998,
    p_end: float = 0.97,
    chunk: int = 256,
):
    """CLIP-Dissect soft-WPMI concept-word scores (Oikarinen & Weng,
    arXiv:2204.10965 §3.2) — (C, V) from a component's top-activating images.

    Unlike plain cosine against the MEAN concept vector, WPMI scores each
    word by how concentrated the evidence set is on it: ``wpmi(w, c) =
    log p(D_c | w) − λ·log p(D_c)`` with ``p(t|x) = softmax_V(a·cos)`` and a
    soft rank-weighted membership ``α_r`` linearly decaying ``p_start →
    p_end`` (the paper's soft-WPMI). A polysemantic unit whose mean vector
    drifts BETWEEN its modes still scores its true mode words highest.

    Parameters
    ----------
    vocab_embeds : (V, D) word embeddings (any scale — cosine inside).
    image_embeds : (N, D) full-dataset image embedding table (the Collect
        fused sweep's table; `ActivationComponentVisualizer.embedding_table`).
    evidence_ids : (C, k) int top-k sample ids per component, −1 sentinels
        ignored.

    Returns (C, V) float32 numpy scores.

    Memory: the full (N, V) softmax table is NEVER materialized — at the
    advertised scales (1.28M-image table × CLIP-Dissect-size vocabulary) it
    would be ~100 GB. Only the ≤ C·k UNIQUE evidence rows are computed, and
    the dataset-mean word probability accumulates over image chunks.
    """
    V = _normalize(jnp.asarray(vocab_embeds, jnp.float32))
    I = jnp.asarray(image_embeds, jnp.float32)
    ids = np.asarray(evidence_ids)
    if ids.ndim != 2:
        raise ValueError(f"evidence_ids must be (C, k), got {ids.shape}")
    n = I.shape[0]
    if ids.max(initial=-1) >= n:
        raise ValueError(
            f"evidence id {int(ids.max())} out of range for a {n}-row embedding table"
        )

    @jax.jit
    def p_rows(rows):
        return jax.nn.softmax(
            temperature
            * jnp.matmul(_normalize(rows), V.T, precision=jax.lax.Precision.HIGHEST),
            axis=1,
        )

    # Pbar: streamed mean over all N images, img_chunk×V at a time.
    img_chunk = max(chunk, 4096)
    psum = jnp.zeros((V.shape[0],), jnp.float32)
    for i in range(0, n, img_chunk):
        psum = psum + jnp.sum(p_rows(I[i : i + img_chunk]), axis=0)
    Pbar = psum / n

    # Softmax rows for the unique evidence ids only; remap ids → row index.
    unique = np.unique(ids[ids >= 0])
    if unique.size == 0:
        return np.zeros((ids.shape[0], int(V.shape[0])), np.float32)
    P_need = p_rows(I[jnp.asarray(unique)])  # (U, V)
    remap = np.searchsorted(unique, np.maximum(ids, 0))

    out = []
    for i in range(0, ids.shape[0], chunk):
        # _wpmi_chunk gathers P[max(ids, 0)]; sentinel rows carry zero weight
        # so any in-range row works — position 0 of the remapped table.
        mapped = np.where(ids[i : i + chunk] >= 0, remap[i : i + chunk], -1)
        out.append(
            np.asarray(
                _wpmi_chunk(
                    P_need,
                    Pbar,
                    jnp.asarray(mapped),
                    lam=lam,
                    p_start=p_start,
                    p_end=p_end,
                )
            )
        )
    return np.concatenate(out, axis=0).astype(np.float32)


def _aggregate_concepts(V):
    """(C, k, D) concept DB → (C, D) aggregated concepts (mean over the
    sample axis, the reference's probing aggregation, ref lens.py:79-84);
    (C, D) passes through."""
    V = jnp.asarray(V, jnp.float32)
    if V.ndim == 3:
        V = jnp.mean(V, axis=1)
    if V.ndim != 2:
        raise ValueError(f"expected (C, k, D) or (C, D) concept DB, got shape {V.shape}")
    return V


_DEAD_NORM = 1e-8  # aggregated FM embeddings are O(1); sentinel rows are 0


@jax.jit
def _drift_jit(a, b):
    cos = jnp.sum(_normalize(a) * _normalize(b), axis=-1)
    dead = (jnp.linalg.norm(a, axis=-1) < _DEAD_NORM) | (
        jnp.linalg.norm(b, axis=-1) < _DEAD_NORM
    )
    return jnp.where(dead, jnp.nan, 1.0 - cos)


def drift_score(V_a, V_b):
    """Per-component semantic drift between two concept DBs of the SAME
    layer shape — e.g. the same architecture before/after fine-tuning.

    Component ``i`` of model A is compared with component ``i`` of model B
    in the shared FM embedding space: ``1 − cos(mean_k A_i, mean_k B_i)``.
    0 = the component kept its meaning; values near 1 = its concept moved
    orthogonally; > 1 = it flipped sign. Accepts (C, k, D) or aggregated
    (C, D) inputs (new capability — the reference has no cross-model
    comparison; composes with its concept-DB artifacts).

    Components dead on either side (all-zero sentinel concept rows, i.e.
    latents with no firing evidence) return **NaN**, not 1.0 — an
    unchanged-but-dead latent is not drift, and letting it score 1.0 would
    drown the audit's top-drifted list in dead components.

    Returns (C,) float32 (NaN for dead components).
    """
    a, b = _aggregate_concepts(V_a), _aggregate_concepts(V_b)
    if a.shape != b.shape:
        raise ValueError(f"component mismatch: {a.shape} vs {b.shape}")
    return _drift_jit(a, b)


@jax.jit
def _match_jit(a, b):
    cos = _cosine_matrix(a, b.T)
    dead_b = jnp.linalg.norm(b, axis=-1) < _DEAD_NORM
    cos = jnp.where(dead_b[None, :], -jnp.inf, cos)
    idx = jnp.argmax(cos, axis=1)
    best = jnp.max(cos, axis=1)
    dead = jnp.linalg.norm(a, axis=-1) < _DEAD_NORM
    return jnp.where(dead, -1, idx), jnp.where(dead, jnp.nan, best)


def match_components(V_a, V_b):
    """Best semantic match in B for every component of A.

    Works across DIFFERENT architectures/layers (C_a need not equal C_b):
    for each aggregated concept of A, the highest-cosine concept of B.
    Returns ``(indices, cosines)`` — (C_a,) int32 indices into B and the
    (C_a,) match cosines. Dead components of A (all-zero sentinel rows)
    return index ``-1`` and cosine NaN; dead rows of B are excluded from
    the argmax (a dead latent is not a semantic match).
    """
    a, b = _aggregate_concepts(V_a), _aggregate_concepts(V_b)
    if a.shape[-1] != b.shape[-1]:
        raise ValueError(f"embedding dim mismatch: {a.shape[-1]} vs {b.shape[-1]}")
    idx, cos = _match_jit(a, b)
    return idx, cos


def semantic_coverage(V_a, V_b, *, threshold: float = 0.9):
    """Fraction of A's LIVE components whose concept survives somewhere in
    B (best match cosine ≥ ``threshold``). Dead components of A (NaN match
    cosine) are excluded from the denominator — a latent with no evidence
    is not a lost concept. NaN if A has no live components. Order matters:
    coverage(A, B) asks "does B still express A's concepts"."""
    _, cos = match_components(V_a, V_b)
    live = ~jnp.isnan(cos)  # NaN = dead in A; −inf (all of B dead) stays live
    n_live = jnp.sum(live.astype(jnp.float32))
    hits = jnp.sum(jnp.where(live, (cos >= threshold).astype(jnp.float32), 0.0))
    return float(jnp.where(n_live > 0, hits / jnp.maximum(n_live, 1.0), jnp.nan))


@jax.jit
def fastcav(pos_embeds, neg_embeds):
    """Concept activation vector via the FastCAV closed form
    (Schmalwasser et al., arXiv:2505.17883): the unit-normalized class-mean
    difference, which the paper shows is equivalent to the classic SVM-CAV
    (TCAV, Kim et al. 2018) under high-dimensional concentration — at a few
    orders of magnitude less compute, and here as ONE fused XLA reduction.

    Parameters
    ----------
    pos_embeds : (P, D) embeddings of concept examples.
    neg_embeds : (N, D) embeddings of random/negative examples.

    Returns (D,) float32 unit vector pointing from the negative set toward
    the concept.
    """
    pos = jnp.mean(jnp.asarray(pos_embeds, jnp.float32), axis=0)
    neg = jnp.mean(jnp.asarray(neg_embeds, jnp.float32), axis=0)
    v = pos - neg
    return v / jnp.maximum(jnp.linalg.norm(v), 1e-12)


def null_calibrated_polysemanticity(V, embedding_table, *, n_null: int = 64,
                                    seed: int = 0, random_state: int = 123):
    """Polysemanticity z-scored against a random-evidence null (NPI).

    The raw polysemanticity score (1 − clarity of 2-means centers) has a
    nonzero floor that depends on k, D, and the embedding geometry — random
    evidence sets score well above 0 — so absolute values are hard to
    compare across layers/models. Following the null-calibration idea of
    arXiv:2508.16950, this draws ``n_null`` size-k evidence sets uniformly
    from the FULL embedding table (the distribution a component's evidence
    would have if it encoded nothing), scores them with the identical
    clustering, and returns the per-component z-score

        NPI_c = (poly_c − mean_null) / (std_null + 1e-12).

    NPI ≈ 0 means "no more polysemantic than random evidence"; strongly
    NEGATIVE means coherent (mono-semantic); values near 0 or above flag
    genuinely mixed components. Components whose evidence rows are all zero
    (−1 sentinels) return NaN, matching drift_score's dead-row convention.

    Parameters
    ----------
    V : (C, k, D) concept-DB slice for one layer.
    embedding_table : (N, D) full-dataset embedding table
        (``ActivationComponentVisualizer.embedding_table``).
    n_null : null sets drawn (one extra batched k-means call total).

    Returns ``(npi (C,), poly (C,), null_mean, null_std)``.
    """
    V = jnp.asarray(V, jnp.float32)
    table = jnp.asarray(embedding_table, jnp.float32)
    if V.ndim != 3 or table.ndim != 2 or V.shape[2] != table.shape[1]:
        raise ValueError(
            f"V must be (C, k, D) and embedding_table (N, D) with matching D; "
            f"got {tuple(V.shape)} and {tuple(table.shape)}"
        )
    n, k = table.shape[0], V.shape[1]
    if n < k:
        raise ValueError(f"embedding table has {n} rows < evidence size {k}")

    key = jax.random.PRNGKey(seed)
    # without-replacement draws per null set. One permutation sliced into
    # disjoint k-windows when the table is big enough (O(N log N) once,
    # vs n_null full permutations — 64 sorts of an ImageNet-scale table);
    # otherwise independent permutations (small tables, cheap anyway).
    if n_null * k <= n:
        perm = jax.random.permutation(key, n)
        ids = perm[: n_null * k].reshape(n_null, k)
    else:
        ids = jax.vmap(lambda kk: jax.random.permutation(kk, n)[:k])(
            jax.random.split(key, n_null)
        )  # (n_null, k)
    null_sets = table[ids]  # (n_null, k, D)

    poly = polysemanticity_score(V, random_state=random_state)
    null_poly = polysemanticity_score(null_sets, random_state=random_state)
    null_mean = jnp.mean(null_poly)
    null_std = jnp.std(null_poly)

    dead = jnp.all(V == 0.0, axis=(1, 2))  # sentinel-only components
    npi = (poly - null_mean) / (null_std + 1e-12)
    npi = jnp.where(dead, jnp.nan, npi)
    return (np.asarray(npi, np.float32), np.asarray(poly, np.float32),
            float(null_mean), float(null_std))
