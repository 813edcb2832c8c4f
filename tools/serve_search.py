"""Serve a built concept DB for interactive search over HTTP.

Loads an aggregated concept DB (a ``concept_db-*.safetensors`` written by
``Lens.compute_concept_db`` — the (C, S, D) tables are mean-aggregated at
load) plus a foundation model for query embedding, then serves
``/text_search``, ``/label``, and ``/healthz`` (see
:mod:`semanticlens_tpu.serve`).

Usage::

    python tools/serve_search.py --db path/to/concept_db-*.safetensors \
        [--fm ViT-B-32|siglip2|mobileclip-s1] [--checkpoint ckpt.safetensors]
        [--bpe merges.gz] [--port 8080] [--templates "a photo of a {}"]
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", required=True, help="concept_db-*.safetensors from Lens")
    ap.add_argument("--fm", default="ViT-B-32")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--bpe", default=None)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--templates", nargs="*", default=["a photo of a {}"])
    args = ap.parse_args()

    import jax.numpy as jnp
    from safetensors.numpy import load_file

    from semanticlens_tpu.serve import SearchService, serve
    from semanticlens_tpu.utils import setup_colored_logging

    setup_colored_logging("INFO")

    raw = load_file(args.db)
    agg = {k: np.asarray(v, np.float32).mean(1) if v.ndim == 3 else np.asarray(v, np.float32)
           for k, v in raw.items()}

    from semanticlens_tpu.foundation_models import create as create_fm

    fm = create_fm(args.fm, checkpoint=args.checkpoint, bpe_path=args.bpe, dtype=jnp.bfloat16)

    service = SearchService(fm, agg, templates=args.templates or None)
    serve(service, args.port)


if __name__ == "__main__":
    main()
