"""Train a sparse autoencoder on a subject-model layer; report throughput.

Drives `semanticlens_tpu.sae.train_sae_on_layer` (the framework's training
workload): streaming device-resident row extraction + scanned donated
optimizer steps. Doubles as the on-chip SAE benchmark — reports wall-clock,
optimizer steps/s, and activation rows/s as one JSON line.

Usage:
  python tools/train_sae.py --arch resnet --depth 50 --layer layer3 \
      --latents 8192 --k 32 --images 2048 --epochs 1
  python tools/train_sae.py --data /path/to/imagefolder --layer layer3
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
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--variant", default="")
    ap.add_argument("--layer", default="layer3")
    ap.add_argument("--latents", type=int, default=8192)
    ap.add_argument("--k", type=int, default=32, help="TopK sparsity; 0 = ReLU+L1")
    ap.add_argument("--aux-k", type=int, default=256)
    ap.add_argument("--jumprelu", action="store_true",
                    help="JumpReLU flavour (requires --k 0): learned per-latent "
                         "thresholds, mse + l0_coef*L0 with STE gradients")
    ap.add_argument("--l0-coef", type=float, default=6e-4)
    ap.add_argument("--ste-eps", type=float, default=1e-3)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=256, help="images per extraction batch")
    ap.add_argument("--batch-rows", type=int, default=4096, help="rows per optimizer step")
    ap.add_argument("--positions", type=int, default=16, help="positions sampled per image")
    ap.add_argument("--images", type=int, default=2048, help="synthetic dataset size")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--data", default="", help="ImageFolder root (synthetic data if unset)")
    ap.add_argument("--out", default="", help="write trained params as .npz")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semanticlens_tpu.core import enable_compilation_cache
    from semanticlens_tpu.data import ArrayDataset
    from semanticlens_tpu.sae import SAEConfig, train_sae_on_layer
    from tools.bench_subject import build_model

    enable_compilation_cache()
    model = build_model(args, jnp)
    params = model.init(jax.random.PRNGKey(0))

    if args.data:
        from semanticlens_tpu.data.image_folder import ImageFolder

        ds = ImageFolder(args.data, image_size=(args.image_size, args.image_size))
    else:
        rng = np.random.default_rng(0)
        ds = ArrayDataset(
            rng.integers(0, 255, size=(args.images, args.image_size, args.image_size, 3),
                         dtype=np.uint8),
            name="synthetic",
        )

    # Layer width via eval_shape (cost-free).
    probe = jax.ShapeDtypeStruct((1, args.image_size, args.image_size, 3), jnp.uint8)
    widths = jax.eval_shape(
        lambda p, x: model.apply(p, x.astype(jnp.bfloat16) / 255.0, (args.layer,))[1],
        params, probe,
    )
    d_in = int(widths[args.layer].shape[-1])

    cfg = SAEConfig(
        d_in=d_in, n_latents=args.latents, k=args.k,
        aux_k=args.aux_k if args.k else 0, lr=args.lr,
        jumprelu=args.jumprelu, l0_coef=args.l0_coef, ste_eps=args.ste_eps,
        batch_rows=args.batch_rows, positions_per_image=args.positions, seed=0,
    )

    def prep(x):
        return x.astype(jnp.bfloat16) / 255.0

    t0 = time.perf_counter()
    sae_params, stats, metrics = train_sae_on_layer(
        model, params, ds, args.layer, cfg,
        batch_size=args.batch, epochs=args.epochs, input_preprocess=prep,
    )
    # Force completion through the async dispatch queue before timing.
    np.asarray(sae_params["W_dec"])
    wall = time.perf_counter() - t0

    steps = int(stats["step"])
    dead = int((np.asarray(stats["last_fired"]) >= cfg.dead_steps).sum())
    if args.out:
        np.savez(args.out, **{k: np.asarray(v) for k, v in sae_params.items()})
    print(json.dumps({
        "layer": args.layer, "d_in": d_in, "latents": args.latents, "k": args.k,
        "jumprelu": args.jumprelu,
        "steps": steps, "rows_per_step": cfg.batch_rows,
        "wall_s": round(wall, 2),
        "steps_per_s": round(steps / wall, 2),
        "rows_per_s": round(steps * cfg.batch_rows / wall, 1),
        "imgs_per_s": round(args.epochs * (len(ds) // args.batch) * args.batch / wall, 1),
        "final_loss": float(metrics["loss"]), "final_fvu": float(metrics["fvu"]),
        "l0": float(metrics["l0"]), "dead_latents": dead,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
