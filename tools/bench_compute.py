"""Compute-ceiling benchmark: device-resident throughput, no host transfers.

The headline ``bench.py`` measures the full pipeline including host→device
transport, which on tunneled dev rigs is noisy and dominant. This tool
isolates what the chip itself sustains (the number that governs real
deployments with local hosts):

- fused Collect step (ResNet-50 fwd + 4-stage aggregation + top-k merge),
- CLIP ViT-B/32 preprocess + encode,

on pre-staged uint8 buffers, timed with forced host readback of the final
result only.

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

    # Warm both programs.
    n_latents = engine.infer_n_latents(params, (b, s, s, 3), np.uint8)
    states = engine._init_states(n_latents)
    step = engine._get_step()
    states = step(states, params, bufs[0], np.int32(0), np.int32(n))
    np.asarray(states["layer4"].values[:1])
    np.asarray(fm.encode_image(fm.preprocess(bufs[0]))[:1])

    t0 = time.perf_counter()
    for i, buf in enumerate(bufs):
        states = step(states, params, buf, np.int32(i * b), np.int32(n))
    np.asarray(states["layer4"].values)
    collect_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    embeds = [fm.encode_image(fm.preprocess(buf)) for buf in bufs]
    np.asarray(embeds[-1][:1])
    embed_s = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "device-resident compute throughput",
                "backend": jax.default_backend(),
                "batch": b,
                "n_images": n,
                "collect_imgs_per_s": round(n / collect_s, 1),
                "embed_imgs_per_s": round(n / embed_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
