"""Lens: orchestration layer for concept-DB computation, probing, and scores.

TPU-native counterpart of the reference ``Lens``
(reference: semanticlens/lens.py:27-480). The Inversion-of-Control pattern is
preserved: the Lens owns the foundation model and the concept-DB cache; the
component visualizer owns the embed loop (``cv._compute_concept_db(fm)``).

Cache layout and filenames are identical to the reference
(lens.py:308-316), so concept DBs are interchangeable between the torch and
TPU implementations.
"""

from __future__ import annotations

import logging

import numpy as np
from safetensors.numpy import load_file, save_file

from semanticlens_tpu.collect.base import AbstractComponentVisualizer
from semanticlens_tpu.foundation_models.base import AbstractVLM
from semanticlens_tpu.scores import (
    clarity_score,
    cosine_probe,
    polysemanticity_score,
    redundancy_score,
)
from semanticlens_tpu.utils.helper import get_fallback_name, host_c_array

logger = logging.getLogger(__name__)


def compute_concept_db(cv: AbstractComponentVisualizer, fm: AbstractVLM):
    """Stateless IoC entry point (reference lens.py:27-56)."""
    return cv._compute_concept_db(fm)


def text_probing(
    fm: AbstractVLM,
    query,
    aggregated_concept_db,
    templates: list[str] | None = None,
    batch_size: int | None = None,
):
    """Cosine-probe an aggregated concept DB with natural-language queries.

    With ``templates``, the embedding of each empty template is subtracted
    from the filled one before averaging — the reference's prompt-bias
    correction (lens.py:192-199), reproduced exactly for score parity.
    """
    queries = query if isinstance(query, list) else [query]
    query_embeds = _embed_text_probes(fm, queries, templates, batch_size)

    assert query_embeds.ndim == 2
    assert query_embeds.shape[0] == len(queries)

    return _probe(query_embeds, aggregated_concept_db)


def image_probing(fm: AbstractVLM, query, aggregated_concept_db):
    """Cosine-probe an aggregated concept DB with image queries.

    Multiple query images are mean-pooled into a single probe vector
    (reference lens.py:124-162).
    """
    query_embed = np.asarray(fm.encode_image(fm.preprocess(query)), np.float32)
    query_embed = query_embed.mean(0)[None] if query_embed.shape[0] > 1 else query_embed
    return _probe(query_embed, aggregated_concept_db)


def cav_probing(
    fm: AbstractVLM,
    concept_images,
    negative_images,
    aggregated_concept_db,
):
    """Probe components with a Concept Activation Vector from image examples.

    TCAV-style concept probing (Kim et al. 2018) with the FastCAV closed
    form (:func:`semanticlens_tpu.scores.fastcav`, arXiv:2505.17883): embed
    a handful of concept examples and negative/random examples with the FM,
    take the unit class-mean-difference direction, and cosine-probe the
    aggregated concept DB with it. A capability extension over the
    reference's single-image / text probing (lens.py:59-162): the CAV
    direction subtracts away whatever the negatives share with the concept
    (style, photographic statistics), which a raw image probe cannot.

    Returns ``{layer: (C,) scores}`` (or a bare array), same contract as
    :func:`image_probing`.
    """
    from semanticlens_tpu.scores import fastcav

    pos = np.asarray(fm.encode_image(fm.preprocess(concept_images)), np.float32)
    neg = np.asarray(fm.encode_image(fm.preprocess(negative_images)), np.float32)
    if pos.ndim != 2 or neg.ndim != 2:
        raise ValueError("concept/negative images must embed to (N, D) batches")
    cav = np.asarray(fastcav(pos, neg), np.float32)[None]  # (1, D)
    return _probe(cav, aggregated_concept_db)


def _encode_text_chunked(fm: AbstractVLM, texts: list[str], batch_size: int | None) -> np.ndarray:
    """tokenize+encode ``texts`` in ``batch_size`` chunks (one batch if None)."""
    step = batch_size or len(texts)
    return np.concatenate(
        [
            np.asarray(fm.encode_text(fm.tokenize(texts[i : i + step])), np.float32)
            for i in range(0, len(texts), step)
        ],
        axis=0,
    )


def _embed_text_probes(fm: AbstractVLM, query: list[str], templates, batch_size):
    """Templating and embedding logic of text probes (reference lens.py:165-203)."""
    if templates:
        query_templated = [t.format(q) for t in templates for q in query]
        query_templated_embeds = _encode_text_chunked(fm, query_templated, batch_size)
        empty_templates_embeds = _encode_text_chunked(fm, [t.format("") for t in templates], None)

        q, t = len(query), len(templates)
        d = query_templated_embeds.shape[-1]
        # Behavioral parity note: the templated list is built template-outer /
        # query-inner, but the reference splits the flat axis query-outer
        # (einops "(q t) d -> q t d", reference lens.py:196-199). For q>1 and
        # t>1 this scrambles (query, template) pairing; we replicate it
        # exactly so probing scores match the reference bit-for-bit.
        templated = query_templated_embeds.reshape(q, t, d)
        query_embed = (templated - empty_templates_embeds[None, :, :]).mean(1)
    else:
        # batch_size applies here too (the reference only chunks the templated
        # path); chunking never changes values, only program sizes.
        query_embed = _encode_text_chunked(fm, query, batch_size)
    return query_embed


def label_components(
    fm: AbstractVLM,
    vocabulary: list[str],
    aggregated_concept_db,
    *,
    top_m: int = 5,
    templates: list[str] | None = None,
    batch_size: int | None = None,
    vocab_embeds: np.ndarray | None = None,
    scoring: str = "cosine",
    evidence_ids=None,
    image_embeds: np.ndarray | None = None,
    **wpmi_kwargs,
):
    """Name each component with its best-matching vocabulary words.

    CLIP-Dissect-style automatic neuron description (Oikarinen & Weng,
    arXiv:2204.10965): every word of ``vocabulary`` is embedded with the FM
    (optionally through prompt ``templates`` with the same empty-template
    bias correction as :func:`text_probing`), then each component is matched
    against the whole vocabulary. A capability extension over the reference,
    which only supports the inverse direction (query → components,
    lens.py:59-121).

    ``scoring`` selects the match:

    - ``"cosine"`` — each component's MEAN concept vector vs each word.
    - ``"wpmi"`` — the paper's soft-WPMI over the component's top-activating
      images (:func:`semanticlens_tpu.scores.soft_wpmi`); needs
      ``evidence_ids`` ((C, k) per layer, −1 sentinels ok — the Collect
      cache's sample ids) and ``image_embeds`` ((N, D) full-dataset table —
      ``ActivationComponentVisualizer.embedding_table`` after a fused
      sweep). Robust where cosine mislabels: a polysemantic unit whose mean
      drifts BETWEEN its modes still names its true modes. Extra kwargs
      (``temperature``, ``lam`` …) forward to :func:`soft_wpmi`.

    Returns ``{layer: (words (C, top_m) list-of-lists, scores (C, top_m)
    float32)}`` — or a single tuple when a bare array is passed.
    """
    from semanticlens_tpu.scores import soft_wpmi, topk_cosine_search

    if not vocabulary:
        raise ValueError("vocabulary must be a non-empty list of words")
    if scoring not in ("cosine", "wpmi"):
        raise ValueError(f"scoring must be 'cosine' or 'wpmi', got {scoring!r}")
    top_m = min(top_m, len(vocabulary))
    if vocab_embeds is None:
        vocab_embeds = _embed_vocabulary(fm, list(vocabulary), templates, batch_size or 1024)
    elif vocab_embeds.shape[0] != len(vocabulary):
        raise ValueError(
            f"vocab_embeds has {vocab_embeds.shape[0]} rows for {len(vocabulary)} words"
        )
    if scoring == "wpmi" and (evidence_ids is None or image_embeds is None):
        raise ValueError(
            "scoring='wpmi' needs evidence_ids (top-k sample ids per layer) and "
            "image_embeds (the (N, D) dataset embedding table)"
        )

    def one(bank, ids=None):
        if scoring == "wpmi":
            ids = np.asarray(ids)
            n_bank = np.asarray(bank).shape[0]
            if ids.ndim != 2 or ids.shape[0] != n_bank:
                raise ValueError(
                    f"evidence_ids shape {ids.shape} does not match the "
                    f"{n_bank}-component concept bank (slice both the same way)"
                )
            scores = soft_wpmi(vocab_embeds, image_embeds, ids, **wpmi_kwargs)
            order = np.argsort(-scores, axis=1)[:, :top_m]
            words = [[vocabulary[j] for j in row] for row in order]
            return words, np.take_along_axis(scores, order, axis=1).astype(np.float32)
        bank = np.asarray(bank, np.float32)
        vals, idx = topk_cosine_search(bank, vocab_embeds, k=top_m)
        idx = np.asarray(idx)
        words = [[vocabulary[j] for j in row] for row in idx]
        return words, np.asarray(vals, np.float32)

    if isinstance(aggregated_concept_db, dict):
        if scoring == "wpmi":
            if not isinstance(evidence_ids, dict):
                raise ValueError("evidence_ids must be a {layer: (C, k)} dict for a dict DB")
            missing = set(aggregated_concept_db) - set(evidence_ids)
            if missing:
                raise ValueError(f"evidence_ids missing layers: {sorted(missing)}")
        return {
            key: one(value, evidence_ids[key] if scoring == "wpmi" else None)
            for key, value in aggregated_concept_db.items()
        }
    return one(aggregated_concept_db, evidence_ids)


def _embed_vocabulary(fm: AbstractVLM, words: list[str], templates, batch_size: int):
    """Correctly-aligned templated embeddings for a large vocabulary.

    NOT :func:`_embed_text_probes`: that helper reproduces the reference's
    ``(q t)`` reshape quirk (lens.py:196-199), which scrambles (query,
    template) pairing whenever q>1 AND t>1 — harmless for the probing API it
    mirrors, but fatal here where q = len(vocabulary). This path keeps the
    pairing straight: embed template-outer, reshape (t, q, d), subtract each
    template's empty-prompt bias, mean over templates. Always chunked by
    ``batch_size`` (a vocabulary can be tens of thousands of words).
    """

    if not templates:
        return _encode_text_chunked(fm, words, batch_size)
    q, t = len(words), len(templates)
    templated = [tpl.format(w) for tpl in templates for w in words]  # template-outer
    embeds = _encode_text_chunked(fm, templated, batch_size).reshape(t, q, -1)
    empty = _encode_text_chunked(fm, [tpl.format("") for tpl in templates], batch_size)  # (t, d)
    return (embeds - empty[:, None, :]).mean(0)


def _probe(query, aggregated_concept_db):
    # cosine_probe, not similarity_score: the reference's shape dispatch
    # (scores.py:122) silently computes the wrong product whenever a layer's
    # component count equals the embedding dim (e.g. 512-channel layers vs a
    # 512-dim CLIP). Probing layouts are known here, so use the unambiguous
    # primitive.
    if isinstance(aggregated_concept_db, dict):
        return {
            key: np.asarray(cosine_probe(query, np.asarray(value, np.float32)))
            for key, value in aggregated_concept_db.items()
        }
    return np.asarray(cosine_probe(query, np.asarray(aggregated_concept_db, np.float32)))


class Lens:
    """Stateful entry point: holds a foundation model, orchestrates the flow.

    Parameters
    ----------
    fm : AbstractVLM — used for all embedding and probing.
    device : accepted for API parity; placement is managed by JAX shardings.
    """

    def __init__(self, fm: AbstractVLM, device=None):
        self.fm: AbstractVLM = fm
        self.device = device

        if not hasattr(self.fm, "name"):
            self.fm.name = get_fallback_name(self.fm)
            logger.debug(f"Assigned fallback name to foundation model: {self.fm.name}")

    def compute_concept_db(self, cv: AbstractComponentVisualizer, **kwargs) -> dict[str, np.ndarray]:
        """Compute or load-from-cache the concept database for ``cv``.

        Cache key: ``{cv.storage_dir}/concept_database/{fm.name}/concept_db-
        {metadata-values-minus-dataset-and-model}.safetensors`` — identical to
        reference lens.py:308-316.
        """
        if cv.caching:
            fdir = cv.storage_dir / "concept_database" / self.fm.name
            fdir.mkdir(parents=True, exist_ok=True)
            fname = (
                "concept_db-"
                + "-".join([v for k, v in cv.metadata.items() if k not in ["dataset", "model"]])
                + ".safetensors"
            )
            fpath = fdir / fname
            if fpath.exists():
                logger.debug("Loading concept DB from cache")
                return load_file(filename=str(fpath))
            logger.debug("Computing concept DB and saving to cache")
            concept_db = cv._compute_concept_db(self.fm, **kwargs)
            # host_c_array: TPU layouts can materialize F-ordered; safetensors
            # would serialize the raw buffer transposed.
            save_file({k: host_c_array(v, np.float32) for k, v in concept_db.items()}, str(fpath))
            logger.debug(f"Saved concept DB to cache {fpath}")
            return concept_db
        else:
            logger.debug("Caching is not enabled. Computing Concept DB")
            return cv._compute_concept_db(self.fm, **kwargs)

    def text_probing(self, query, aggregated_concept_db, templates=None, batch_size=None):
        """Wrapper over the stateless :func:`text_probing` with the held FM."""
        return text_probing(self.fm, query, aggregated_concept_db, templates, batch_size)

    def image_probing(self, query, aggregated_concept_db):
        """Wrapper over the stateless :func:`image_probing` with the held FM."""
        return image_probing(self.fm, query, aggregated_concept_db)

    def cav_probing(self, concept_images, negative_images, aggregated_concept_db):
        """Wrapper over the stateless :func:`cav_probing` with the held FM."""
        return cav_probing(self.fm, concept_images, negative_images, aggregated_concept_db)

    def label_components(self, vocabulary, aggregated_concept_db, **kwargs):
        """Wrapper over the stateless :func:`label_components` with the held FM."""
        return label_components(self.fm, vocabulary, aggregated_concept_db, **kwargs)

    @staticmethod
    def _score_input(value):
        """float32 array for the jitted scores — device placement preserved.

        A jax.Array keeps its device placement so mesh-sharded concept DBs
        (:func:`semanticlens_tpu.core.shard_concept_db`) run the Analyze
        stage data-parallel — but still casts to float32 (an elementwise op,
        sharding-preserving): the scores' documented reference parity is
        float32 math regardless of how the DB was stored (e.g. bf16).
        """
        import jax
        import jax.numpy as jnp

        if isinstance(value, jax.Array):
            return value if value.dtype == jnp.float32 else value.astype(jnp.float32)
        return np.asarray(value, np.float32)

    def eval_clarity(self, concept_db):
        """Clarity per component (reference lens.py:391-419)."""
        if isinstance(concept_db, dict):
            return {key: clarity_score(self._score_input(value)) for key, value in concept_db.items()}
        return clarity_score(self._score_input(concept_db))

    def eval_redundancy(self, aggregated_concept_db):
        """Redundancy across components (reference lens.py:421-449)."""
        if isinstance(aggregated_concept_db, dict):
            return {
                key: redundancy_score(self._score_input(value))
                for key, value in aggregated_concept_db.items()
            }
        return redundancy_score(self._score_input(aggregated_concept_db))

    def eval_polysemanticity(self, concept_db):
        """Polysemanticity per component (reference lens.py:451-480)."""
        if isinstance(concept_db, dict):
            return {
                key: polysemanticity_score(self._score_input(value))
                for key, value in concept_db.items()
            }
        return polysemanticity_score(self._score_input(concept_db))
