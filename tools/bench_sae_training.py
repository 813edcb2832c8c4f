"""Sustained SAE / transcoder training rates on chip: rows/s end-to-end.

The step latency of the SAE trainer is known (12.63 ms at (4096, 8192) k=32,
docs/PERF_NOTES.md round 3), but users of a dictionary-learning stack ask for
the END-TO-END training rate first: tap extraction + shuffling + optimizer
scan, device-resident, over a real dataset pass. This tool measures
``train_sae_on_layer`` and ``train_transcoder_on_layer`` (conv tap on
ResNet-50 and token tap on GPT-2-small config) and prints one JSON line
per workload:

    {"workload": ..., "rows_per_s": N, "imgs_per_s"|"tokens_per_s": N, ...}

Each workload runs twice with epochs=1: the first call pays compile (and
warms the persistent cache), the second is the steady-state end-to-end
epoch the rate is computed from (tap extraction + shuffle + optimizer scan,
init/calibration included — it is what a user's epoch costs).
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


def _time(fn):
    t0 = time.perf_counter()
    out = fn()
    # params materialization forces the whole training pipeline
    np.asarray(out[0]["W_dec"])
    return time.perf_counter() - t0


def bench_vision(n_images: int, batch: int, positions: int, batch_rows: int) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models.resnet import ResNet
    from semanticlens_tpu.sae import SAEConfig, train_sae_on_layer, train_transcoder_on_layer

    model = ResNet(depth=50, num_classes=1000, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n_images, 224, 224, 3), np.uint8)
    ds = ArrayDataset(images, name="sae-bench")
    prep = lambda x: x.astype(jnp.float32) / 255.0  # noqa: E731

    rows_per_img = positions  # positions_per_image subsampling
    out = []

    # SAE on a conv tap (layer3: 14x14x1024 -> positions rows of d_in=1024)
    cfg = SAEConfig(d_in=1024, n_latents=8192, k=32, batch_rows=batch_rows,
                    positions_per_image=positions, seed=0)
    run = lambda e: _time(  # noqa: E731
        lambda: train_sae_on_layer(model, params, ds, "layer3", cfg,
                                   batch_size=batch, input_preprocess=prep, epochs=e)
    )
    w1 = run(1)  # compile + warm
    epoch_s = run(1)  # steady-state epoch
    out.append({
        "workload": "sae_conv_tap(resnet50.layer3, d_in=1024, 8192 latents, k=32)",
        "rows_per_s": round(n_images * rows_per_img / epoch_s, 1),
        "imgs_per_s": round(n_images / epoch_s, 1),
        "steady_epoch_s": round(epoch_s, 2),
        "first_epoch_s_incl_compile": round(w1, 2),
        "rows_per_image": rows_per_img,
    })
    print(json.dumps(out[-1]), flush=True)

    # PAIRED transcoder across the last stage (block input -> stage output:
    # positionally aligned 7x7 taps, the MLP-replacement analogue for convs)
    tcfg = SAEConfig(d_in=2048, d_out=2048, n_latents=8192, k=32, batch_rows=batch_rows,
                     positions_per_image=positions, seed=0)
    run = lambda e: _time(  # noqa: E731
        lambda: train_transcoder_on_layer(model, params, ds, "layer4.0", "layer4", tcfg,
                                          batch_size=batch, input_preprocess=prep, epochs=e)
    )
    w1 = run(1)  # compile + warm
    epoch_s = run(1)  # steady-state epoch
    out.append({
        "workload": "transcoder_conv(resnet50.layer4.0->layer4, 8192 latents, k=32)",
        "rows_per_s": round(n_images * rows_per_img / epoch_s, 1),
        "imgs_per_s": round(n_images / epoch_s, 1),
        "steady_epoch_s": round(epoch_s, 2),
        "first_epoch_s_incl_compile": round(w1, 2),
        "rows_per_image": rows_per_img,
    })
    print(json.dumps(out[-1]), flush=True)
    return out


def bench_lm(n_seqs: int, batch: int, seq_len: int, batch_rows: int) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.models.gpt import GPT2
    from semanticlens_tpu.sae import SAEConfig, train_sae_on_layer, train_transcoder_on_layer

    model = GPT2(dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    toks = rng.integers(0, 50257, (n_seqs, seq_len)).astype(np.int32)
    ds = ArrayDataset(toks, name="sae-lm-bench")
    prep = lambda x: x  # noqa: E731

    d = 768
    out = []
    cfg = SAEConfig(d_in=d, n_latents=8192, k=32, batch_rows=batch_rows, seed=0)
    tap_in, tap_out = "transformer.h.5.ln_2", "transformer.h.5.mlp"
    run = lambda e: _time(  # noqa: E731
        lambda: train_sae_on_layer(model, params, ds, tap_out, cfg,
                                   batch_size=batch, input_preprocess=prep, epochs=e)
    )
    w1 = run(1)  # compile + warm
    epoch_s = run(1)  # steady-state epoch
    out.append({
        "workload": f"sae_token_tap(gpt2.{tap_out}, d_in={d}, 8192 latents, k=32)",
        "rows_per_s": round(n_seqs * seq_len / epoch_s, 1),
        "tokens_per_s": round(n_seqs * seq_len / epoch_s, 1),
        "steady_epoch_s": round(epoch_s, 2),
        "first_epoch_s_incl_compile": round(w1, 2),
        "seq_len": seq_len,
    })
    print(json.dumps(out[-1]), flush=True)

    tcfg = SAEConfig(d_in=d, d_out=d, n_latents=8192, k=32, batch_rows=batch_rows, seed=0)
    run = lambda e: _time(  # noqa: E731
        lambda: train_transcoder_on_layer(model, params, ds, tap_in, tap_out, tcfg,
                                          batch_size=batch, input_preprocess=prep, epochs=e)
    )
    w1 = run(1)  # compile + warm
    epoch_s = run(1)  # steady-state epoch
    out.append({
        "workload": f"transcoder_token(gpt2.{tap_in}->{tap_out}, 8192 latents, k=32)",
        "rows_per_s": round(n_seqs * seq_len / epoch_s, 1),
        "tokens_per_s": round(n_seqs * seq_len / epoch_s, 1),
        "steady_epoch_s": round(epoch_s, 2),
        "first_epoch_s_incl_compile": round(w1, 2),
        "seq_len": seq_len,
    })
    print(json.dumps(out[-1]), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--positions", type=int, default=64)
    ap.add_argument("--n-seqs", type=int, default=512)
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--batch-rows", type=int, default=4096)
    ap.add_argument("--skip-lm", action="store_true")
    ap.add_argument("--skip-vision", action="store_true")
    args = ap.parse_args()

    from semanticlens_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    import jax

    results = []
    if not args.skip_vision:
        results += bench_vision(args.n_images, args.batch, args.positions, args.batch_rows)
    if not args.skip_lm:
        results += bench_lm(args.n_seqs, args.batch, args.seq_len, args.batch_rows)
    print(json.dumps({
        "metric": "SAE/transcoder end-to-end training rates (tap extraction + training)",
        "backend": jax.default_backend(),
        "workloads": results,
    }))


if __name__ == "__main__":
    main()
