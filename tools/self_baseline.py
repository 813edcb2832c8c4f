"""Measure THIS framework's throughput on the same CPU as ref_baseline.py.

The headline bench's ``vs_baseline`` ratio folds in the TPU-vs-CPU hardware
gap (labeled as such). This tool produces the **like-for-like** number: the
identical workload (ResNet-50 collect over layer1–4 + CLIP ViT-B/32 embed,
same image count/batch/top-k) run by THIS framework on the same single CPU
core the reference pipeline was measured on. The ratio of the two is a pure
framework-vs-framework comparison — XLA-CPU + fused single pass + on-device
top-k versus torch-CPU + forward hooks + per-batch host top-k + two sweeps.

Prints one JSON line: {"self_cpu_imgs_per_s": N, ...}
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
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--n-collect", type=int, default=25)
    args = ap.parse_args()

    import jax

    # env JAX_PLATFORMS does not stick under the axon sitecustomize; the
    # config update is the reliable switch (tests/conftest.py does the same).
    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from semanticlens_tpu.collect import ActivationComponentVisualizer
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(0)
    images = rng.integers(
        0, 255, size=(args.n_images, args.image_size, args.image_size, 3), dtype=np.uint8
    )
    ds = ArrayDataset(images, name="self-baseline")

    # f32 on CPU: XLA-CPU has no native bf16 compute units; f32 is the honest
    # fast path there (torch baseline runs f32 too).
    model = ResNet(depth=50, num_classes=1000, dtype=jnp.float32)
    model.params = model.init(jax.random.PRNGKey(0))
    model.name = "resnet50-selfbase"
    fm = OpenClip("ViT-B-32", dtype=jnp.float32, seed=0)

    mean, std = jnp.asarray(IMAGENET_MEAN), jnp.asarray(IMAGENET_STD)

    def model_preprocess(x):
        return (x.astype(jnp.float32) / 255.0 - mean) / std

    cv = ActivationComponentVisualizer(
        model=model,
        dataset_model=ds,
        dataset_fm=ds,
        layer_names=["layer1", "layer2", "layer3", "layer4"],
        num_samples=args.n_collect,
        aggregate_fn=aggregate_conv_mean,
        cache_dir=None,
        model_preprocess=model_preprocess,
    )

    # Compile outside the timed window (the torch baseline has no compile
    # phase; excluding XLA compile keeps the comparison about EXECUTION).
    warm = ArrayDataset(images[: args.batch], name="warm")

    def embed_fn(x):
        return fm.encode_image(fm.preprocess(x))

    cv.engine.run_fused(model.params, warm, args.batch, embed_fn)

    t0 = time.perf_counter()
    states, embeds, n_seen = cv.engine.run_fused(model.params, ds, args.batch, embed_fn)
    np.asarray(states["layer4"].values)
    np.asarray(embeds)
    wall = time.perf_counter() - t0
    assert n_seen == args.n_images

    print(
        json.dumps(
            {
                "self_cpu_imgs_per_s": round(args.n_images / wall, 3),
                "device": jax.default_backend(),
                "n_images": args.n_images,
                "batch": args.batch,
                "image_size": args.image_size,
                "n_collect": args.n_collect,
                "wall_s": round(wall, 2),
                "pipeline": "fused single-pass collect+embed, XLA CPU, f32",
            }
        )
    )


if __name__ == "__main__":
    main()
