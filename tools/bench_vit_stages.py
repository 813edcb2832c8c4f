"""Per-block FLOPs-vs-time attribution for the CLIP ViT-B/32 tower.

Companion to tools/bench_resnet_stages.py for the FM side of the fused
headline. Tap-cut cumulative programs (XLA dead-code-eliminates past the
cut), FLOPs from compiled.cost_analysis(), chained timing; per-range = diff.
Documented findings: docs/PERF_NOTES.md (uniform ~93 TF/s per block).

Usage: python tools/bench_vit_stages.py [--batch 256] [--steps 8]
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--cuts", type=int, nargs="*", default=[0, 3, 7, 11])
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.foundation_models.clip import (
        CLIP_PRESETS,
        init_clip_params,
        vit_encode_image,
    )

    cfg = CLIP_PRESETS[args.model]
    if cfg.vision.kind != "vit":
        raise SystemExit("--model must be a ViT preset")
    bad = [i for i in args.cuts if not 0 <= i < cfg.vision.layers]
    if bad:
        raise SystemExit(
            f"--cuts {bad} out of range: {args.model} has resblocks 0..{cfg.vision.layers - 1}"
        )
    params = jax.device_put(
        jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.ndim > 0 else a,
            init_clip_params(jax.random.PRNGKey(0), cfg),
        )
    )
    b, s = args.batch, cfg.vision.image_size
    rng = np.random.default_rng(0)
    bufs = [
        jax.device_put(jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32), jnp.bfloat16))
        for _ in range(args.steps)
    ]
    for x in bufs:
        x.block_until_ready()

    def make_cut(cut_name):
        @jax.jit
        def run(params, *bs):
            acc = jnp.zeros((), jnp.float32)
            for x in bs:
                store = {}

                def tap(name, val):
                    if name == cut_name:
                        store["v"] = val
                    return val

                out = vit_encode_image(params, cfg, x, dtype=jnp.bfloat16, tap=tap)
                acc = acc + (
                    jnp.sum(store["v"].astype(jnp.float32)) if cut_name != "OUT" else jnp.sum(out)
                )
            return acc

        return run

    def best_of(fn, *a):
        np.asarray(fn(*a))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    cuts = [f"visual.transformer.resblocks.{i}" for i in args.cuts] + ["OUT"]
    rows, prev_t, prev_fl = [], 0.0, 0.0
    for cut in cuts:
        fn = make_cut(cut)
        compiled = fn.lower(params, *bufs).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get("flops", float("nan")))
        t = best_of(fn, params, *bufs)
        dt, dfl = t - prev_t, fl - prev_fl
        rows.append(
            {
                "cut": cut,
                "cum_ms": round(t * 1e3, 1),
                "delta_ms": round(dt * 1e3, 1),
                "delta_gflop": round(dfl / 1e9, 0),
                "delta_tflops_per_s": round(dfl / dt / 1e12, 1) if dt > 1e-4 else None,
            }
        )
        prev_t, prev_fl = t, fl
    print(
        json.dumps(
            {
                "model": args.model,
                "batch": b,
                "steps_chained": args.steps,
                "imgs_per_s_full": round(args.steps * b / prev_t, 0),
                "per_range": rows,
            }
        )
    )


if __name__ == "__main__":
    main()
