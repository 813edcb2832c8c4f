"""Concept-drift audit between two concept databases.

Compares two models through the lens of the SAME foundation-model embedding
space: which components kept their meaning, which drifted, and how much of
model A's concept inventory survives in model B. Inputs are the concept-DB
safetensors artifacts that ``Lens.compute_concept_db`` caches (one tensor
per layer, ``(C, k, D)``) — so a drift audit needs no model forward passes
at all (new capability; the reference has no cross-model comparison but its
cached artifacts compose directly).

Usage:
    # Same architecture before/after fine-tuning: per-component drift.
    python tools/diff_models.py a/concept_db-....safetensors b/concept_db-....safetensors

    # Different architectures: semantic coverage of A's concepts by B.
    python tools/diff_models.py a.safetensors b.safetensors --coverage --threshold 0.85

Prints one JSON line per layer plus a summary line.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("db_a", help="concept-DB safetensors of model A")
    ap.add_argument("db_b", help="concept-DB safetensors of model B")
    ap.add_argument("--coverage", action="store_true",
                    help="best-match coverage instead of index-aligned drift "
                    "(use for differing architectures/layer widths)")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="coverage match-cosine threshold (default 0.9)")
    ap.add_argument("--top", type=int, default=10, help="top drifted components to list")
    args = ap.parse_args()

    from safetensors.numpy import load_file

    import jax

    # Tiny cosine workloads — no reason to touch the TPU tunnel. env
    # JAX_PLATFORMS does not stick under the axon sitecustomize; force it
    # via config (same pattern as tools/train_sae.py).
    jax.config.update("jax_platforms", "cpu")

    from semanticlens_tpu import scores

    a = load_file(args.db_a)
    b = load_file(args.db_b)
    layers = sorted(set(a) & set(b))
    if not layers:
        raise SystemExit(f"no shared layers: A has {sorted(a)}, B has {sorted(b)}")
    only_a, only_b = sorted(set(a) - set(b)), sorted(set(b) - set(a))
    if only_a or only_b:
        print(json.dumps({"warning": "unshared layers skipped", "only_a": only_a, "only_b": only_b}))

    worst = []
    for layer in layers:
        if args.coverage:
            idx, cos = scores.match_components(a[layer], b[layer])
            cos = np.asarray(cos)
            live = ~np.isnan(cos)  # dead components of A: no evidence, no concept
            cov = scores.semantic_coverage(a[layer], b[layer], threshold=args.threshold)
            print(json.dumps({
                "layer": layer,
                "components_a": int(np.asarray(idx).shape[0]),
                "dead_a": int((~live).sum()),
                "coverage": round(cov, 4) if np.isfinite(cov) else None,
                "median_match_cos": round(float(np.median(cos[live])), 4) if live.any() else None,
            }))
            worst += [(layer, int(i), 1.0 - float(c))
                      for i, c in enumerate(cos) if live[i]]
        else:
            drift = np.asarray(scores.drift_score(a[layer], b[layer]))
            live = ~np.isnan(drift)  # dead on either side: not drift (scores.py)
            d = drift[live]
            print(json.dumps({
                "layer": layer,
                "components": int(drift.shape[0]),
                "dead": int((~live).sum()),
                "mean_drift": round(float(d.mean()), 4) if d.size else None,
                "p95_drift": round(float(np.percentile(d, 95)), 4) if d.size else None,
                "max_drift": round(float(d.max()), 4) if d.size else None,
            }))
            worst += [(layer, int(i), float(x)) for i, x in enumerate(drift) if live[i]]

    worst.sort(key=lambda t: -t[2])
    print(json.dumps({
        "top_drifted": [
            {"layer": layer, "component": comp, "drift": round(d, 4)}
            for layer, comp, d in worst[: args.top]
        ]
    }))


if __name__ == "__main__":
    main()
