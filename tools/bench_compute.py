"""Compute-ceiling benchmark: device-resident throughput, no host transfers.

The headline ``bench.py`` measures the full pipeline including host→device
transport, which on tunneled dev rigs is noisy and dominant. This tool
isolates what the chip itself sustains (the number that governs real
deployments with local hosts):

- fused Collect step (ResNet-50 fwd + 4-stage aggregation + top-k merge),
- CLIP ViT-B/32 preprocess + encode,

plus the production combined path (both networks in ONE program per
batch), on pre-staged distinct uint8 buffers. Methodology per
docs/PERF_NOTES.md: all steps chained inside one jitted program with a
device-side reduction (the tunneled runtime adds a ~32 ms floor per program
invocation), best of 3.

Usage: python tools/bench_compute.py [--batch 256] [--steps 8]
"""

from __future__ import annotations

import sys
from pathlib import Path

# Allow running as `python tools/<tool>.py` from a source checkout.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))


import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=224)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    b, n_steps, s = args.batch, args.steps, args.image_size
    n = b * n_steps

    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    fm = OpenClip("ViT-B-32", dtype=jnp.bfloat16, seed=0)
    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)

    engine = CollectEngine(
        model=model,
        layer_names=("layer1", "layer2", "layer3", "layer4"),
        aggregation_fn=aggregate_conv_mean,
        n_collect=25,
        input_preprocess=lambda x: (x.astype(jnp.float32) / 255.0 - mean) / std,
    )

    # Stage distinct buffers (identical uploads can be dedup-cached by some
    # transports) and sync every one before timing.
    rng = np.random.default_rng(0)
    bufs = [
        jax.device_put(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8)) for _ in range(n_steps)
    ]
    for buf in bufs:
        np.asarray(buf[:1, :1, :1])

    n_latents = engine.infer_n_latents(params, (b, s, s, 3), np.uint8)

    def best_of(fn, *args, reps=3):
        np.asarray(fn(*args))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            times.append(time.perf_counter() - t0)
        return min(times)

    @jax.jit
    def collect_chain(states, params, *batches):
        for i, buf in enumerate(batches):
            ids = jnp.int32(i * b) + jnp.arange(b, dtype=jnp.int32)
            states = engine._local_step(states, params, buf, ids, jnp.ones((b,), bool))
        return jnp.sum(states["layer4"].values.astype(jnp.float32))

    @jax.jit
    def embed_chain(fm_params, *batches):
        return sum(jnp.sum(fm._encode_image(fm_params, fm.preprocess(buf))) for buf in batches)

    @jax.jit
    def fused_chain(states, params, fm_params, *batches):
        acc = jnp.zeros((), jnp.float32)
        for i, buf in enumerate(batches):
            ids = jnp.int32(i * b) + jnp.arange(b, dtype=jnp.int32)
            states = engine._local_step(states, params, buf, ids, jnp.ones((b,), bool))
            acc = acc + jnp.sum(fm._encode_image(fm_params, fm.preprocess(buf)))
        return acc + jnp.sum(states["layer4"].values.astype(jnp.float32))

    collect_s = best_of(lambda *bs: collect_chain(engine._init_states(n_latents), params, *bs), *bufs)
    embed_s = best_of(lambda *bs: embed_chain(fm.params, *bs), *bufs)
    fused_s = best_of(
        lambda *bs: fused_chain(engine._init_states(n_latents), params, fm.params, *bs), *bufs
    )

    print(
        json.dumps(
            {
                "metric": "device-resident compute throughput (chained, best of 3)",
                "backend": jax.default_backend(),
                "batch": b,
                "n_images": n,
                "collect_imgs_per_s": round(n / collect_s, 1),
                "embed_imgs_per_s": round(n / embed_s, 1),
                "fused_one_program_imgs_per_s": round(n / fused_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
