"""Causal validation of collected concept evidence (ablate-and-measure).

For each audited component: collect its top-activating evidence images
(the Collect stage), zero-ablate the component, and compare the output
change on its OWN evidence vs random control images —
``semanticlens_tpu.causal.necessity_ratio``. Ratios ≫ 1 certify the
component is causally load-bearing exactly where SemanticLens says it
fires; ratios ≈ 1 flag passenger correlations (beyond-reference
capability: the reference's audit is correlational only).

Usage:
  python tools/causal_audit.py --arch resnet --depth 18 --layer layer3 \
      --components 8 --images 256 --image-size 96
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--depth", type=int, default=18)
    ap.add_argument("--variant", default="")
    ap.add_argument("--layer", default="layer3")
    ap.add_argument("--components", type=int, default=8,
                    help="audit the N components with the strongest evidence")
    ap.add_argument("--evidence", type=int, default=8, help="evidence images per component")
    ap.add_argument("--images", type=int, default=256, help="synthetic dataset size")
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--mode", default="zero", choices=["zero", "mean"])
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"],
                    help="model activation dtype; float32 default — single-channel "
                         "ablation deltas on a bfloat16 model can fall below bf16 "
                         "resolution and turn the ratios into rounding noise")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semanticlens_tpu import causal
    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.core import enable_compilation_cache
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.ops.aggregators import aggregate_max_auto
    from tools.bench_subject import build_model

    enable_compilation_cache()
    model = build_model(args, jnp)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "causal-audit"

    rng = np.random.default_rng(0)
    images = rng.integers(
        0, 255, size=(args.images, args.image_size, args.image_size, 3), dtype=np.uint8
    ).astype(np.float32) / 255.0
    ds = ArrayDataset(images, name="causal-synthetic")

    cv = ActivationComponentVisualizer(
        model=model, dataset_model=ds, dataset_fm=ds,
        layer_names=[args.layer], num_samples=args.evidence,
        aggregate_fn=aggregate_max_auto, cache_dir=None,
    )
    t0 = time.perf_counter()
    cache = cv.run(batch_size=args.batch)
    act = cache[args.layer]
    strength = act.activations.astype(np.float32)[:, 0]  # strongest evidence
    comp_ids = np.argsort(-strength)[: args.components]

    ratios = []
    for comp in comp_ids:
        ev_ids = np.asarray(act.sample_ids[comp])
        ev_ids = ev_ids[ev_ids >= 0]
        if ev_ids.size == 0:
            ratios.append(None)
            continue
        control = rng.choice(args.images, size=ev_ids.size, replace=False)
        r = causal.necessity_ratio(
            model, model.params, args.layer, [int(comp)],
            jnp.asarray(images[ev_ids]), jnp.asarray(images[control]), mode=args.mode,
        )
        ratios.append(float(np.asarray(r)[0]))
    wall = time.perf_counter() - t0

    live = [r for r in ratios if r is not None]
    for comp, r in zip(comp_ids.tolist(), ratios):
        print(json.dumps({"component": comp, "necessity_ratio":
                          round(r, 3) if r is not None else None}))
    print(json.dumps({
        "layer": args.layer, "mode": args.mode, "components": len(comp_ids),
        "median_ratio": round(float(np.median(live)), 3) if live else None,
        "min_ratio": round(float(np.min(live)), 3) if live else None,
        "wall_s": round(wall, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
