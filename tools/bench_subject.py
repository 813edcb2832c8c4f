"""Subject-model compute-ceiling benchmark for any zoo family.

Chained methodology (docs/PERF_NOTES.md): N batches pre-staged device-
resident, all N forwards compiled into ONE jitted program with a device-side
scalar reduction, best of 3 — isolating chip throughput from the tunnel's
~32 ms per-dispatch floor and its single-digit-MB/s transport.

Usage: python tools/bench_subject.py --arch densenet --depth 121
       python tools/bench_subject.py --arch efficientnet --variant b0
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


def build_model(args, jnp):
    from semanticlens_tpu import models

    # activation dtype: bfloat16 (MXU-native) for throughput tools; audits
    # that measure small output DELTAS (tools/causal_audit.py) pass float32
    # so per-channel ablation effects stay above rounding noise.
    dt = getattr(jnp, getattr(args, "dtype", "bfloat16"))
    if args.arch == "resnet":
        return models.ResNet(depth=args.depth, dtype=dt)
    if args.arch == "vit":
        return models.VisionTransformer(image_size=args.image_size, dtype=dt)
    if args.arch == "convnext":
        return models.ConvNeXt(variant=args.variant or "tiny", dtype=dt)
    if args.arch == "vgg":
        return models.VGG(depth=args.depth if args.depth != 50 else 16, dtype=dt)
    if args.arch == "densenet":
        return models.DenseNet(depth=args.depth if args.depth != 50 else 121, dtype=dt)
    if args.arch == "efficientnet":
        return models.EfficientNet(variant=args.variant or "b0", dtype=dt)
    if args.arch == "mobilenetv2":
        return models.MobileNetV2(dtype=dt)
    if args.arch == "mobilenetv3":
        return models.MobileNetV3(variant=args.variant or "large", dtype=dt)
    if args.arch == "swin":
        return models.SwinTransformer(variant=args.variant or "tiny", dtype=dt)
    if args.arch == "swin_v2":
        return models.SwinTransformerV2(variant=args.variant or "tiny", dtype=dt)
    if args.arch == "googlenet":
        return models.GoogLeNet(dtype=dt)
    if args.arch == "inception_v3":
        return models.InceptionV3(dtype=dt)
    if args.arch == "resnext":  # torchvision resnext{50_32x4d,101_32x8d}
        width = 8 if args.depth == 101 else 4
        return models.ResNet(depth=args.depth, groups=32, width_per_group=width, dtype=dt)
    if args.arch == "wide_resnet":  # torchvision wide_resnet{50,101}_2
        return models.ResNet(depth=args.depth, width_per_group=128, dtype=dt)
    if args.arch == "regnet":  # torchvision regnet_{x,y}_*
        return models.RegNet(variant=args.variant or "y_400mf", dtype=dt)
    if args.arch == "shufflenet":  # torchvision shufflenet_v2_x*
        return models.ShuffleNetV2(variant=args.variant or "x1_0", dtype=dt)
    if args.arch == "efficientnet_v2":  # torchvision efficientnet_v2_{s,m,l}
        return models.EfficientNetV2(variant=args.variant or "v2_s", dtype=dt)
    if args.arch == "alexnet":
        return models.AlexNet(dtype=dt)
    if args.arch == "squeezenet":  # torchvision squeezenet{1_0,1_1}
        return models.SqueezeNet(version=args.variant or "1_0", dtype=dt)
    if args.arch == "mnasnet":  # torchvision mnasnet{0_5,0_75,1_0,1_3}
        return models.MNASNet(variant=args.variant or "1_0", dtype=dt)
    if args.arch == "maxvit":  # torchvision maxvit_t (224-divisible inputs)
        return models.MaxViT(variant=args.variant or "tiny", dtype=dt)
    if args.arch == "gpt2":  # HF gpt2/-medium/-large/-xl; token input (--seq-len)
        return models.GPT2.from_name(args.variant or "gpt2", dtype=dt)
    if args.arch == "llama":  # HF llama-2-7b/-3.2-1b/mistral-7b-v0.1/…
        return models.Llama.from_name(args.variant or "llama-3.2-1b", dtype=dt)
    if args.arch == "qwen2":  # HF qwen2.5-0.5b/-1.5b/-7b
        return models.Qwen2.from_name(args.variant or "qwen2.5-0.5b", dtype=dt)
    if args.arch == "gemma":  # HF gemma-2b/-7b
        return models.Gemma.from_name(args.variant or "gemma-2b", dtype=dt)
    if args.arch == "gemma2":  # HF gemma-2-2b/-9b/-27b
        return models.Gemma2.from_name(args.variant or "gemma-2-2b", dtype=dt)
    if args.arch == "phi3":  # HF phi-3-mini-4k/-medium-4k
        return models.Phi3.from_name(args.variant or "phi-3-mini-4k", dtype=dt)
    raise SystemExit(f"unknown arch {args.arch}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet")
    ap.add_argument("--depth", type=int, default=50)
    ap.add_argument("--variant", default="")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    ap.add_argument("--seq-len", type=int, default=512,
                    help="token length for --arch gpt2/llama/gemma")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from semanticlens_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    model = build_model(args, jnp)
    params = model.init(jax.random.PRNGKey(0))
    b, n_steps, s = args.batch, args.steps, args.image_size

    rng = np.random.default_rng(0)
    if args.arch in ("gpt2", "llama", "qwen2", "gemma", "gemma2", "phi3"):  # token batches; "image" = one sequence
        s = args.seq_len
        batches = [
            jax.device_put(rng.integers(0, model.vocab_size, size=(b, s), dtype=np.int32))
            for _ in range(n_steps)
        ]

        @jax.jit
        def chained(params, batches):
            acc = jnp.zeros((), jnp.float32)
            for x in batches:
                out, _ = model.apply(params, x)
                acc = acc + out.astype(jnp.float32).sum()
            return acc

    else:
        batches = [
            jax.device_put(rng.integers(0, 255, size=(b, s, s, 3), dtype=np.uint8))
            for _ in range(n_steps)
        ]

        @jax.jit
        def chained(params, batches):
            acc = jnp.zeros((), jnp.float32)
            for x in batches:
                out, _ = model.apply(params, x.astype(jnp.bfloat16) / 255.0)
                acc = acc + out.astype(jnp.float32).sum()
            return acc

    # warm compile + one throwaway run
    np.asarray(chained(params, batches))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained(params, batches))
        best = min(best, time.perf_counter() - t0)

    imgs = b * n_steps
    depth = args.depth
    if depth == 50:  # resnet-default sentinel; build_model resolves per family
        depth = {"vgg": 16, "densenet": 121}.get(args.arch, 50)
    label = {
        "resnet": f"resnet{depth}",
        "vgg": f"vgg{depth}",
        "densenet": f"densenet{depth}",
        "vit": "vit-b",
        "convnext": f"convnext-{args.variant or 'tiny'}",
        "efficientnet": f"efficientnet-{args.variant or 'b0'}",
        "mobilenetv2": "mobilenet_v2",
        "mobilenetv3": f"mobilenet_v3_{args.variant or 'large'}",
        "resnext": f"resnext{args.depth}_32x{8 if args.depth == 101 else 4}d",
        "wide_resnet": f"wide_resnet{args.depth}_2",
        "googlenet": "googlenet",
        "inception_v3": "inception_v3",
        "swin": f"swin_{(args.variant or 'tiny')[0]}",
        "swin_v2": f"swin_v2_{(args.variant or 'tiny')[0]}",
        "regnet": f"regnet_{args.variant or 'y_400mf'}",
        "shufflenet": f"shufflenet_v2_{args.variant or 'x1_0'}",
        "efficientnet_v2": f"efficientnet_{args.variant or 'v2_s'}",
        "alexnet": "alexnet",
        "squeezenet": f"squeezenet{args.variant or '1_0'}",
        "mnasnet": f"mnasnet{args.variant or '1_0'}",
        "maxvit": f"maxvit_{args.variant or 'tiny'}",
        "gpt2": args.variant or "gpt2",
        "llama": args.variant or "llama-3.2-1b",
        "qwen2": args.variant or "qwen2.5-0.5b",
        "gemma": args.variant or "gemma-2b",
        "gemma2": args.variant or "gemma-2-2b",
        "phi3": args.variant or "phi-3-mini-4k",
    }[args.arch]
    print(json.dumps({
        "model": label,
        "batch": b,
        "steps": n_steps,
        "image_size": s,
        "wall_s": round(best, 4),
        "imgs_per_s": round(imgs / best, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
