"""Config-4 end-to-end: RelevanceComponentVisualizer on ResNet-50 (on chip).

BASELINE.json config 4 is "RelevanceComponentVisualizer with attribution-based
cropping on ResNet-50/ImageNet" (reference relevance_based.py:151-200 — which
is marked broken upstream; this framework's version works). This tool runs the
FULL pipeline on real hardware and reports per-stage wall-clock:

  1. Collect sweep  — fused streaming engine over an ImageNet-100-val-scale
                      synthetic dataset (5,000 × 224² uint8 by default).
  2. Concept DB     — per-component ε-plus-flat LRP heatmaps (batched K
                      components per XLA program), attribution crop/mask on
                      host, CLIP ViT-B/32 embedding of the crops.

Through the dev tunnel (~7–17 MB/s h2d) both stages are transport-bound; the
tool therefore also times a warm device-resident attribution burst so the
design-attributable heatmaps/s is reported separately from tunnel weather
(same policy as bench.py / docs/PERF_NOTES.md).

Prints one JSON line.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=5000,
                    help="synthetic dataset size (5000 = ImageNet-100 val scale)")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--layer", default="layer3",
                    help="ResNet-50 tap (layer3 = 1024 components)")
    ap.add_argument("--n-ref", type=int, default=8,
                    help="attribution-cropped examples embedded per component")
    ap.add_argument("--sweep-batch", type=int, default=64)
    ap.add_argument("--attr-batch", type=int, default=256,
                    help="images per attribution program (K = batch // n_ref)")
    ap.add_argument("--components", type=int, default=0,
                    help="limit concept-DB stage to the first N components (0 = all)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.collect.relevance_based import RelevanceComponentVisualizer
    from semanticlens_tpu.core import enable_compilation_cache
    from semanticlens_tpu.data.dataset import ArrayDataset
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    enable_compilation_cache()
    s = args.image_size
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (args.n_images, s, s, 3), dtype=np.uint8)
    ds = ArrayDataset(images, name=f"synth{args.n_images}")

    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "resnet50"
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)

    def preprocess(x):
        return (x.astype(jnp.float32) / 255.0 - mean) / std

    fm = OpenClip("ViT-B-32", dtype=jnp.bfloat16, seed=0)

    with tempfile.TemporaryDirectory() as tmp:
        cv = RelevanceComponentVisualizer(
            model=model,
            dataset=ds,
            layer_names=[args.layer],
            preprocess_fn=preprocess,
            num_samples=args.n_ref,
            storage_dir=tmp,
        )

        t0 = time.perf_counter()
        cv.run(batch_size=args.sweep_batch, checkpoint=0)
        sweep_s = time.perf_counter() - t0

        ids_table = cv.get_act_max_sample_ids(args.layer)
        n_components = int(ids_table.shape[0])
        if args.components:
            n_components = min(args.components, n_components)
            # Bench subset: shrink the table the concept-DB stage reads.
            cv.actmax_cache[args.layer].state = cv.actmax_cache[args.layer].state._replace(
                values=cv.actmax_cache[args.layer].state.values[:n_components],
                ids=cv.actmax_cache[args.layer].state.ids[:n_components],
            )

        t0 = time.perf_counter()
        db = cv._compute_concept_db(fm, batch_size=args.attr_batch, n_ref=args.n_ref)
        db_s = time.perf_counter() - t0
        mat = db[args.layer]
        assert mat.shape[0] == n_components, mat.shape
        n_heatmaps = n_components * args.n_ref

        # Warm device-resident attribution burst: the design-attributable rate.
        fn = cv._batched_attribution_fn(args.layer)
        k = max(1, min(32, args.attr_batch // args.n_ref))
        burst = jnp.asarray(
            rng.integers(0, 255, (k, args.n_ref, s, s, 3), dtype=np.uint8).astype(np.float32)
        )
        comps = jnp.arange(k, dtype=jnp.int32)
        np.asarray(fn(model.params, burst, comps))  # compile + warm
        reps = 4
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(model.params, burst, comps)
        np.asarray(out)
        device_heat_s = (time.perf_counter() - t0) / reps
        device_heatmaps_per_s = k * args.n_ref / device_heat_s

    result = {
        "metric": "config4 relevance e2e (ResNet-50 -> LRP crop -> CLIP ViT-B/32)",
        "n_images": args.n_images,
        "layer": args.layer,
        "n_components": n_components,
        "n_ref": args.n_ref,
        "sweep_wall_s": round(sweep_s, 2),
        "sweep_imgs_per_s": round(args.n_images / sweep_s, 1),
        "concept_db_wall_s": round(db_s, 2),
        "n_heatmaps": n_heatmaps,
        "e2e_heatmaps_per_s": round(n_heatmaps / db_s, 1),
        "device_heatmaps_per_s": round(device_heatmaps_per_s, 1),
        "total_wall_s": round(sweep_s + db_s, 2),
        "note": "e2e rates include tunnel h2d (~7-17 MB/s); device_heatmaps_per_s "
        "is the warm on-chip attribution rate",
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
