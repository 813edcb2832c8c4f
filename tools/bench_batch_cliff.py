"""Batch-cliff decomposition: which tower loses throughput at large batch?

The round-4 batch sweep (docs/PERF_NOTES.md "Fused-pipeline batch-size
sweep") found the fused Collect+Embed pipeline peaks at batch 128 and loses
~14% at batch >= 512, with the cause "not root-caused" (no device tracing
through the tunnel). This tool decomposes the loss by measuring, per batch
size, three device-resident scan-chain programs over the SAME total images:

  - forward-only: ResNet-50 forward + 4-layer aggregation (no top-k)
  - collect-only: forward + aggregation + top-k update
  - embed-only:   CLIP ViT-B/32 preprocess + encode
  - fused:        both in one program (the production Collect+Embed body)

If the conv tower degrades at 512 while the ViT holds, the HBM-pressure
hypothesis (early-stage conv activations: 56x56x256 at batch 512 is ~1.6 GB
live in bf16) is supported; if both degrade equally the cause is elsewhere.
``collect - forward`` isolates the top-k merge cost, which scans
O((k+B) log) per component row and is the only stage whose per-image work
GROWS with batch (the merge runs once per batch over C rows of k+B
candidates, so candidates/img = (k+B)/B falls but sort width rises).

Methodology matches bench.py's ceilings stage (reference workload:
activation_based.py:341-358 + 392-433 executed as one fused pass): one
stacked (chain, batch, H, W, 3) uint8 pool uploaded once, lax.scan threads
the donated top-k state through the chain, result reduced on device, best of
3 timed repeats per program. Prints one JSON line per batch size.
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

import jax
import jax.numpy as jnp

from semanticlens_tpu.core import enable_compilation_cache


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, nargs="+", default=[128, 256, 512])
    ap.add_argument("--total", type=int, default=2048, help="images per measurement")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    enable_compilation_cache()

    from semanticlens_tpu.collect.engine import CollectEngine
    from semanticlens_tpu.foundation_models.clip import OpenClip
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.ops.aggregators import aggregate_conv_mean
    from semanticlens_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD

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

    # Pool generated ON DEVICE: the probe isolates device compute, and a
    # degraded tunnel (observed <0.4 MB/s) turns a 294 MB host upload into
    # a 15+ minute stall that has nothing to do with the cliff under test.
    t0 = time.perf_counter()
    flat = jax.jit(
        lambda k: jax.random.randint(k, (args.total, 224, 224, 3), 0, 255, jnp.uint8),
        static_argnums=(),
    )(jax.random.PRNGKey(0))
    np.asarray(flat[:1, :1, :1])
    gen_s = time.perf_counter() - t0
    print(
        json.dumps({
            "pool_mb": round(args.total * 224 * 224 * 3 / 2**20, 1),
            "device_gen_s": round(gen_s, 1),
        }),
        flush=True,
    )

    for batch in args.batches:
        chain = args.total // batch
        stacked = jnp.reshape(flat[: chain * batch], (chain, batch, 224, 224, 3))
        np.asarray(stacked[:1, :1, :1, :1])
        n_latents = engine.infer_n_latents(params, (batch, 224, 224, 3), np.uint8)

        @jax.jit
        def collect_chain(states, p, st, batch=batch):
            def body(carry, xb):
                s, i = carry
                ids = i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
                s = engine._local_step(s, p, xb, ids, jnp.ones((batch,), bool))
                return (s, i + 1), ()

            (states, _), _ = jax.lax.scan(body, (states, jnp.int32(0)), st)
            return jnp.sum(states["layer4"].values.astype(jnp.float32))

        @jax.jit
        def forward_chain(p, st):
            def body(acc, xb):
                x = engine.input_preprocess(xb)
                _, taps = engine.model.apply(p, x, engine.layer_names)
                s = sum(
                    jnp.sum(engine.aggregation_fn(taps[n]).astype(jnp.float32))
                    for n in engine.layer_names
                )
                return acc + s, ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), st)
            return acc

        @jax.jit
        def embed_chain(fp, st):
            def body(acc, xb):
                return acc + jnp.sum(fm._encode_image(fp, fm.preprocess(xb))), ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), st)
            return acc

        @jax.jit
        def embed_core_chain(fp, st):
            # Encode with preprocess hoisted out (inputs already bf16-normalized):
            # ``embed - embed_core`` isolates the uint8→float normalize, whose
            # materialized intermediate grows to 308 MB/step at batch 512.
            def body(acc, xb):
                return acc + jnp.sum(fm._encode_image(fp, xb)), ()

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), st)
            return acc

        @jax.jit
        def fused_chain(states, p, fp, st, batch=batch):
            def body(carry, xb):
                s, i = carry
                ids = i * jnp.int32(batch) + jnp.arange(batch, dtype=jnp.int32)
                s = engine._local_step(s, p, xb, ids, jnp.ones((batch,), bool))
                emb = jnp.sum(fm._encode_image(fp, fm.preprocess(xb)))
                return (s, i + 1), emb

            (states, _), embs = jax.lax.scan(body, (states, jnp.int32(0)), st)
            return jnp.sum(embs) + jnp.sum(states["layer4"].values.astype(jnp.float32))

        def best_of(fn, *fargs, n=args.repeats):
            np.asarray(fn(*fargs))  # compile + warm
            ts = []
            for _ in range(n):
                t0 = time.perf_counter()
                np.asarray(fn(*fargs))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        total = chain * batch
        row = {"batch": batch, "chain": chain}
        row["forward_imgs_per_s"] = round(
            total / best_of(lambda s: forward_chain(params, s), stacked), 1
        )
        row["collect_imgs_per_s"] = round(
            total / best_of(lambda s: collect_chain(engine._init_states(n_latents), params, s), stacked), 1
        )
        row["embed_imgs_per_s"] = round(total / best_of(lambda s: embed_chain(fm.params, s), stacked), 1)
        pre = jax.jit(lambda f: jnp.reshape(fm.preprocess(f), (chain, batch, 224, 224, 3)))(
            flat[: chain * batch]
        )
        np.asarray(pre[:1, :1, :1, :1])
        row["embed_core_imgs_per_s"] = round(
            total / best_of(lambda s: embed_core_chain(fm.params, s), pre), 1
        )
        del pre
        row["fused_imgs_per_s"] = round(
            total
            / best_of(
                lambda s: fused_chain(engine._init_states(n_latents), params, fm.params, s), stacked
            ),
            1,
        )
        print(json.dumps(row), flush=True)
        del stacked


if __name__ == "__main__":
    main()
