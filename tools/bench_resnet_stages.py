"""Per-stage FLOPs-vs-time attribution for the ResNet-50 forward.

Round-2 left the gap between the full ResNet-50 forward (~42 TF/s) and the
bare mid-network conv ceiling (115–117 TF/s) attributed to "the
architecture's layer mix" without evidence. This tool produces the evidence:

1. **FLOPs per stage** from XLA's own ``compiled.cost_analysis()`` on
   cumulative slice programs (stem → +layer1 → … → +fc); per-stage = diff.
2. **Time per stage** from chained device-resident measurements of the same
   cumulative programs (8 batches inside one program, best of 3 — the
   methodology of docs/PERF_NOTES.md); per-stage = diff.

Prints one JSON object with the per-stage table (GFLOP, ms, TF/s, % time,
arithmetic intensity) so the PERF_NOTES table is reproducible.

Usage: python tools/bench_resnet_stages.py [--batch 256] [--steps 8]
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
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.models import ResNet
    from semanticlens_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    b, s = args.batch, args.image_size
    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    with timer.stage("init"):
        params = model.init(jax.random.PRNGKey(0))
        params = jax.device_put(params)
        rng = np.random.default_rng(0)
        bufs = [
            jax.device_put(
                jnp.asarray(rng.normal(size=(b, s, s, 3)).astype(np.float32), jnp.bfloat16)
            )
            for _ in range(args.steps)
        ]
        for buf in bufs:
            buf.block_until_ready()

    # Cumulative cuts: everything up to (and including) the named tap. XLA
    # dead-code-eliminates the layers after the cut because only the tap
    # feeds the output reduction.
    cuts = ["maxpool", "layer1", "layer2", "layer3", "layer4", "fc"]

    def make_cum(cut):
        @jax.jit
        def run(params, *batches):
            acc = jnp.zeros((), jnp.float32)
            for buf in batches:
                _, taps = model.apply(params, buf, (cut,))
                acc = acc + jnp.sum(taps[cut].astype(jnp.float32))
            return acc

        return run

    def best_of(fn, *fargs):
        np.asarray(fn(*fargs))  # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn(*fargs))
            times.append(time.perf_counter() - t0)
        return min(times)

    cum_flops, cum_time, cum_bytes = {}, {}, {}
    for cut in cuts:
        fn = make_cum(cut)
        with timer.stage(f"compile+measure-{cut}"):
            lowered = fn.lower(params, *bufs)
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            cum_flops[cut] = float(ca.get("flops", float("nan")))
            cum_bytes[cut] = float(ca.get("bytes accessed", float("nan")))
            cum_time[cut] = best_of(fn, params, *bufs)

    table = []
    prev_f, prev_t, prev_b = 0.0, 0.0, 0.0
    n_imgs = b * args.steps
    for cut in cuts:
        fl = cum_flops[cut] - prev_f
        tm = cum_time[cut] - prev_t
        by = cum_bytes[cut] - prev_b
        prev_f, prev_t, prev_b = cum_flops[cut], cum_time[cut], cum_bytes[cut]
        table.append(
            {
                "stage": cut,
                "gflop": round(fl / 1e9, 1),
                "gbytes": round(by / 1e9, 2),
                "ms": round(tm * 1e3, 2),
                "tflops_per_s": round(fl / tm / 1e12, 1) if tm > 0 else None,
                "gbytes_per_s": round(by / tm / 1e9, 0) if tm > 0 else None,
                "flops_per_byte": round(fl / by, 0) if by > 0 else None,
                "pct_time": None,  # filled below
            }
        )
    total_t = cum_time[cuts[-1]]
    for row in table:
        row["pct_time"] = round(100.0 * (row["ms"] / 1e3) / total_t, 1)

    print(
        json.dumps(
            {
                "model": "ResNet-50 bf16",
                "batch": b,
                "steps_chained": args.steps,
                "imgs_per_s_full": round(n_imgs / total_t, 0),
                "full_tflops_per_s": round(cum_flops[cuts[-1]] / total_t / 1e12, 1),
                "per_stage": table,
                "note": "cumulative-slice programs; per-stage = diffs; "
                "flops from XLA compiled.cost_analysis()",
                "stages": timer.summary(),
            }
        )
    )


if __name__ == "__main__":
    main()
