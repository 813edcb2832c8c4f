"""Feature-synthesis throughput on the attached accelerator.

Measures `featviz.synthesize` (batched feature visualization: K canvases
ascend K components in one lax.scan program) on ResNet-50 layer3 at 224²,
reporting cold (compile-inclusive) and warm wall-clock plus the warm
forward+backward rate. Prints one JSON line per (K, steps) config.
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=16, help="components per program")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--layer", default="layer3")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--loop", default="host", choices=["scan", "host"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.core import enable_compilation_cache
    from semanticlens_tpu.featviz import SynthesisConfig, synthesize
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    enable_compilation_cache()
    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "rn50-featviz-bench"
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def pre(x):
        return (x / 255.0 - mean) / std

    cfg = SynthesisConfig(steps=args.steps)
    k = args.k

    t0 = time.perf_counter()
    _, obj = synthesize(model, model.params, args.layer, list(range(k)),
                        aggregate_conv_mean, image_size=args.image_size,
                        model_preprocess=pre, config=cfg, seed=0, loop=args.loop)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    _, obj2 = synthesize(model, model.params, args.layer, list(range(k, 2 * k)),
                         aggregate_conv_mean, image_size=args.image_size,
                         model_preprocess=pre, config=cfg, seed=1, loop=args.loop)
    warm = time.perf_counter() - t0
    print(json.dumps({
        "metric": "feature-synthesis throughput (ResNet-50 %s, %d²)" % (args.layer, args.image_size),
        "k": k,
        "steps": args.steps,
        "cold_s": round(cold, 1),
        "warm_s": round(warm, 1),
        "canvases_per_s_warm": round(k / warm, 2),
        "fwdbwd_per_s_warm": round(k * args.steps / warm, 1),
        "loop": args.loop,
        "objective_finite": bool(np.isfinite(obj).all() and np.isfinite(obj2).all()),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
