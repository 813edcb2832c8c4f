"""Concept-search serving: query a built concept DB as a long-lived service.

The reference ends at a Python API (notebooks); deploying an audit means
serving its artifacts. This module wraps a foundation model + aggregated
concept DB as a :class:`SearchService` with warm jitted search programs, and
exposes it over plain HTTP (stdlib ``http.server`` — zero extra
dependencies) via :func:`serve` / ``tools/serve_search.py``.

Endpoints (all GET, JSON responses):

- ``/healthz``                         → ``{"ok": true, "layers": [...]}``
- ``/text_search?q=dog&k=5``           → per-layer top-k component ids+scores
- ``/label?words=dog,cat&top_m=3``     → per-component vocabulary labels
  (CLIP-Dissect style, :func:`semanticlens_tpu.lens.label_components`)
- ``POST /image_search?k=5`` (body: image file bytes) → per-layer top-k
  components for an image query (reference image_probing direction)

Scores use the same cosine/streaming-top-k primitives as the audit tools, so
serving-time results match offline probing exactly.
"""

from __future__ import annotations

import json
import logging
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

logger = logging.getLogger(__name__)

# Largest accepted POST body (image uploads). PIL's decompression-bomb guard
# (Image.MAX_IMAGE_PIXELS, enabled by default) covers the decoded side.
MAX_BODY_BYTES = 16 * 1024 * 1024


class _BadRequest(ValueError):
    """Client input error — rendered as HTTP 400, not 500."""


class SearchService:
    """Warm query service over an aggregated concept DB.

    Parameters
    ----------
    fm : foundation model with ``tokenize`` / ``encode_text`` (and optionally
        ``preprocess`` / ``encode_image`` for image queries).
    aggregated_db : ``{layer: (n_components, D) float32}`` — the mean-
        aggregated concept DB (``concept_db.mean(1)``).
    templates : prompt templates applied to text queries, with the same
        empty-template bias correction as ``Lens.text_probing``.
    """

    def __init__(self, fm, aggregated_db: dict, *, templates=None, warmup: bool = True):
        self.fm = fm
        self.templates = templates
        self.banks = {k: np.asarray(v, np.float32) for k, v in aggregated_db.items()}
        if not self.banks:
            raise ValueError("aggregated_db must contain at least one layer")
        # ThreadingHTTPServer handles each request on its own thread: the
        # lazy jit of the fused program and the vocab-embedding cache need
        # single-shot construction under concurrency.
        self._fused_lock = threading.Lock()
        self._vocab_cache: dict = {}
        # Normalized banks go to the device EAGERLY: building them lazily
        # inside a traced fused program would store tracers (constants become
        # tracers under trace) that leak into every later program.
        self._device_banks()
        if warmup:
            # Compile the query paths BEFORE accepting traffic: on TPU the
            # first encode pays the full tower compile (minutes through a
            # remote-compile backend) — that cost belongs to startup, not to
            # the first user request. The fused search program (fixed FUSED_K)
            # compiles here too, so no client request can trigger a compile.
            logger.info("warming text-search program...")
            self.text_search("warmup", k=1)
            if hasattr(fm, "encode_image") and hasattr(fm, "preprocess"):
                logger.info("warming image-search program...")
                try:
                    self.image_search(np.zeros((32, 32, 3), np.uint8), k=1)
                except Exception:  # FM without a usable image tower — text-only service
                    logger.warning(
                        "image-search warmup failed; image queries disabled cold",
                        exc_info=True,
                    )
            logger.info("search service ready (%d layers)", len(self.banks))

    # The fused one-dispatch search always answers FUSED_K candidates per
    # layer and slices to the requested k — exactly ONE compiled program no
    # matter what k clients send (no request-driven recompiles). Banks whose
    # TOTAL size exceeds the element budget (~1 GB f32 of normalized copies)
    # stay on the HBM-bounded streaming path.
    FUSED_K = 32
    FUSED_SEARCH_MAX_ELEMENTS = 1 << 28

    def _device_banks(self):
        """Normalized device-resident banks. First build happens EAGERLY in
        __init__ — never under a jit trace, where the 'constants' would be
        recorded as tracers and leak into every later program."""
        import jax.numpy as jnp

        if not hasattr(self, "_banks_dev"):
            norm = lambda a: a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
            self._banks_dev = {k_: norm(jnp.asarray(v)) for k_, v in self.banks.items()}
        return self._banks_dev

    def _fits_fused(self, k: int) -> bool:
        """Whether the one-compiled-program path serves this k/bank size."""
        if not hasattr(self, "_total_bank_elements"):
            self._total_bank_elements = sum(int(np.prod(v.shape)) for v in self.banks.values())
        return k <= self.FUSED_K and self._total_bank_elements <= self.FUSED_SEARCH_MAX_ELEMENTS

    @staticmethod
    def _format_topk(results: dict, k: int) -> dict:
        """Device top-FUSED_K results → the JSON payload, sliced to k."""
        return {
            layer: {
                "ids": np.asarray(idx)[:k].tolist(),
                "scores": [round(float(v), 6) for v in np.asarray(vals)[:k]],
            }
            for layer, (vals, idx) in results.items()
        }

    def _bank_search_traced(self, q):
        """Trace-time core shared by all fused programs: normalized (1, D)
        query → per-layer (top-FUSED_K values, ids). HIGHEST precision so
        served scores equal the offline probing path bit-for-bit."""
        import jax
        import jax.numpy as jnp

        qn = q.astype(jnp.float32)
        qn = qn / jnp.maximum(jnp.linalg.norm(qn, axis=-1, keepdims=True), 1e-12)
        out = {}
        for layer, bank in self._device_banks().items():
            sim = jnp.matmul(qn, bank.T, precision=jax.lax.Precision.HIGHEST)[0]
            out[layer] = jax.lax.top_k(sim, min(self.FUSED_K, bank.shape[0]))
        return out

    def _fused_search(self):
        """One jitted program: (1, D) query → every layer's top-FUSED_K."""
        import jax

        if not hasattr(self, "_fused_program"):
            with self._fused_lock:
                if hasattr(self, "_fused_program"):  # lost the build race
                    return self._fused_program
                self._fused_program = jax.jit(self._bank_search_traced)
        return self._fused_program

    def _fused_text_search(self):
        """TOKEN IDS → text tower → every layer's top-FUSED_K, ONE dispatch.

        The two-dispatch path (encode_text, host round trip, bank search)
        pays the per-program floor twice; built-in FMs expose their raw
        pieces (``params`` + jitted ``_encode_text``), so the whole query
        compiles into one XLA program. Returns None for FMs without the
        traceable contract (mock/test FMs) — callers fall back, including
        when a duck-typed FM matches the attribute names but fails to trace
        (the caller disables the path on first error).

        With templates, the query-independent empty-template embeddings are
        computed ONCE at build time and baked into the program as the bias
        constant — each request encodes only the T filled rows.
        """
        import jax
        import jax.numpy as jnp

        fm = self.fm
        if not (hasattr(fm, "params") and hasattr(fm, "_encode_text")):
            return None
        if getattr(self, "_fused_text_disabled", False):
            return None
        if not hasattr(self, "_fused_text_program"):
            with self._fused_lock:
                if hasattr(self, "_fused_text_program"):
                    return self._fused_text_program
                try:
                    if self.templates:
                        empty_emb = jnp.asarray(
                            fm._encode_text(
                                fm.params, fm.tokenize([t.format("") for t in self.templates])
                            ),
                            jnp.float32,
                        )  # (T, D) — a constant of the service
                    else:
                        empty_emb = None

                    @jax.jit
                    def search_text(params, tokens):
                        emb = fm._encode_text(params, tokens).astype(jnp.float32)
                        if empty_emb is not None:
                            q = jnp.mean(emb - empty_emb, axis=0, keepdims=True)
                        else:
                            q = emb
                        return self._bank_search_traced(q)

                    self._fused_text_program = search_text
                except Exception:
                    logger.warning(
                        "FM matches the traceable contract by name but failed to "
                        "build the fused text search; using the two-step path",
                        exc_info=True,
                    )
                    self._fused_text_disabled = True
                    return None
        return self._fused_text_program

    def _bank_topk(self, q: np.ndarray, k: int) -> dict:
        """(1, D) query → per-layer top-k ids+scores (shared search core)."""
        if self._fits_fused(k):
            return self._format_topk(self._fused_search()(q), k)

        from semanticlens_tpu.scores import topk_cosine_search

        out = {}
        for layer, bank in self.banks.items():
            vals, idx = topk_cosine_search(q, bank, k=min(k, bank.shape[0]))
            out[layer] = {
                "ids": np.asarray(idx)[0].tolist(),
                "scores": [round(float(v), 6) for v in np.asarray(vals)[0]],
            }
        return out

    def text_search(self, query: str, k: int = 5) -> dict:
        """Top-k components per layer for a natural-language query."""
        fused = self._fused_text_search() if self._fits_fused(k) else None
        if fused is not None:
            texts = (
                [t.format(query) for t in self.templates] if self.templates else [query]
            )
            try:
                return self._format_topk(fused(self.fm.params, self.fm.tokenize(texts)), k)
            except Exception:
                logger.warning(
                    "fused text search failed at dispatch; falling back to the "
                    "two-step path permanently",
                    exc_info=True,
                )
                self._fused_text_disabled = True

        from semanticlens_tpu.lens import _embed_text_probes

        return self._bank_topk(_embed_text_probes(self.fm, [query], self.templates, None), k)

    def _fused_image_search(self):
        """Preprocessed image batch → vision tower → all-layer top-k, ONE
        dispatch (see :meth:`_fused_text_search`); None without the
        traceable FM contract."""
        import jax
        import jax.numpy as jnp

        fm = self.fm
        if not (hasattr(fm, "params") and hasattr(fm, "_encode_image")):
            return None
        if getattr(self, "_fused_image_disabled", False):
            return None
        if not hasattr(self, "_fused_image_program"):
            with self._fused_lock:
                if hasattr(self, "_fused_image_program"):
                    return self._fused_image_program

                @jax.jit
                def search_image(params, images):
                    emb = fm._encode_image(params, images).astype(jnp.float32)
                    q = jnp.mean(emb, axis=0, keepdims=True)  # single image in practice
                    return self._bank_search_traced(q)

                self._fused_image_program = search_image
        return self._fused_image_program

    def image_search(self, image: np.ndarray, k: int = 5) -> dict:
        """Top-k components per layer for an image query (H, W, 3 uint8)."""
        fused = self._fused_image_search() if self._fits_fused(k) else None
        if fused is not None:
            try:
                return self._format_topk(
                    fused(self.fm.params, self.fm.preprocess(image[None])), k
                )
            except Exception:
                logger.warning(
                    "fused image search failed at dispatch; falling back to the "
                    "two-step path permanently",
                    exc_info=True,
                )
                self._fused_image_disabled = True
        q = np.asarray(self.fm.encode_image(self.fm.preprocess(image[None])), np.float32)
        return self._bank_topk(q, k)

    # Distinct vocabularies whose embeddings stay cached. Each entry is
    # (V, D) float32 — tens of KB for typical vocab sizes; evicted FIFO.
    VOCAB_CACHE_ENTRIES = 8

    def _vocab_embeds(self, vocabulary: list[str]) -> np.ndarray:
        """Embed a vocabulary once per (words, templates); repeat /label
        requests skip the full FM text-tower pass."""
        key = (tuple(vocabulary), tuple(self.templates) if self.templates else None)
        with self._fused_lock:
            hit = self._vocab_cache.get(key)
        if hit is not None:
            return hit
        from semanticlens_tpu.lens import _embed_vocabulary

        embeds = _embed_vocabulary(self.fm, list(vocabulary), self.templates, 1024)
        with self._fused_lock:
            while len(self._vocab_cache) >= self.VOCAB_CACHE_ENTRIES:
                self._vocab_cache.pop(next(iter(self._vocab_cache)))
            self._vocab_cache[key] = embeds
        return embeds

    def label(self, vocabulary: list[str], top_m: int = 3, max_components: int = 64) -> dict:
        """Per-component vocabulary labels for the first ``max_components``."""
        from semanticlens_tpu.lens import label_components

        # Slice the banks first — labeling runs the vocabulary match only on
        # the components actually reported.
        head = {k: v[:max_components] for k, v in self.banks.items()}
        named = label_components(
            self.fm,
            vocabulary,
            head,
            top_m=top_m,
            templates=self.templates,
            vocab_embeds=self._vocab_embeds(list(vocabulary)),
        )
        return {
            layer: [
                {"component": i, "words": words[i], "scores": [round(float(v), 6) for v in vals[i]]}
                for i in range(len(words))
            ]
            for layer, (words, vals) in named.items()
        }


class _Handler(BaseHTTPRequestHandler):
    service: SearchService  # set by serve()

    def log_message(self, fmt, *args):  # route through the package logger
        logger.debug("http: " + fmt, *args)

    def _json(self, payload, status=200):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _int_param(self, qs, name: str, default: int) -> int:
        """Positive-int query param; raises _BadRequest (→ 400) on junk."""
        raw = qs.get(name, [str(default)])[0]
        try:
            value = int(raw)
        except ValueError:
            raise _BadRequest(f"{name} must be an integer, got {raw!r}") from None
        if value < 1:
            raise _BadRequest(f"{name} must be >= 1, got {value}")
        return value

    def do_GET(self):  # noqa: N802 — http.server API
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        try:
            if url.path == "/healthz":
                self._json({"ok": True, "layers": sorted(self.service.banks)})
            elif url.path == "/text_search":
                query = qs.get("q", [""])[0]
                if not query:
                    self._json({"error": "missing q parameter"}, 400)
                    return
                k = self._int_param(qs, "k", 5)
                self._json({"query": query, "results": self.service.text_search(query, k)})
            elif url.path == "/label":
                words = [w for w in qs.get("words", [""])[0].split(",") if w]
                if not words:
                    self._json({"error": "missing words parameter"}, 400)
                    return
                top_m = self._int_param(qs, "top_m", 3)
                max_components = self._int_param(qs, "max_components", 64)
                n_total = max(v.shape[0] for v in self.service.banks.values())
                self._json(
                    {
                        "results": self.service.label(words, top_m, max_components),
                        "truncated": n_total > max_components,
                        "max_components": max_components,
                    }
                )
            else:
                self._json({"error": f"unknown path {url.path}"}, 404)
        except _BadRequest as exc:
            self._json({"error": str(exc)}, 400)
        except Exception as exc:  # pragma: no cover — defensive: keep serving
            logger.exception("request failed")
            self._json({"error": f"{type(exc).__name__}: {exc}"}, 500)

    def do_POST(self):  # noqa: N802 — http.server API
        url = urlparse(self.path)
        qs = parse_qs(url.query)
        try:
            if url.path != "/image_search":
                self._json({"error": f"unknown path {url.path}"}, 404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self._json({"error": "bad Content-Length header"}, 400)
                return
            if not length:
                self._json({"error": "missing request body (image file bytes)"}, 400)
                return
            if length > MAX_BODY_BYTES:
                # Reject BEFORE reading: an attacker-controlled Content-Length
                # must not drive an arbitrary-size allocation / PIL decode.
                self._json(
                    {"error": f"request body {length} exceeds cap {MAX_BODY_BYTES}"}, 413
                )
                return
            import io

            from PIL import Image

            raw = self.rfile.read(length)
            image = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
            k = self._int_param(qs, "k", 5)
            self._json({"results": self.service.image_search(image, k)})
        except _BadRequest as exc:
            self._json({"error": str(exc)}, 400)
        except Exception as exc:  # pragma: no cover — defensive: keep serving
            logger.exception("request failed")
            self._json({"error": f"{type(exc).__name__}: {exc}"}, 500)


def serve(service: SearchService, port: int = 0, *, background: bool = False):
    """Run the HTTP server. Returns (server, thread|None).

    ``port=0`` binds an ephemeral port (``server.server_address[1]``).
    ``background=True`` serves from a daemon thread (used by tests and by
    callers embedding the service in a larger process).
    """
    handler = type("BoundHandler", (_Handler,), {"service": service})
    server = ThreadingHTTPServer(("127.0.0.1", port), handler)
    logger.info("serving concept search on port %d", server.server_address[1])
    if background:
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        return server, thread
    server.serve_forever()
    return server, None
