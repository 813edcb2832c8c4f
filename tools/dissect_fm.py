"""Dissect a foundation model's own neurons: name them with a vocabulary.

Demo/CLI for :mod:`semanticlens_tpu.foundation_models.dissect`: maps every
MLP hidden unit of the chosen blocks to its direct-effect direction in the
joint embedding space, labels each direction against a vocabulary
(CLIP-Dissect style), and reports the most nameable neurons per block.

Usage::

    python tools/dissect_fm.py --fm ViT-B-32 [--checkpoint ckpt.safetensors]
        [--blocks 8 9 10 11] [--tower visual] \
        [--vocabulary dog cat stripes sky ...] [--top 8]

Offline (no checkpoint) it runs with random weights — the machinery is
identical; only the semantics of the labels change.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import json

import numpy as np

DEFAULT_VOCAB = [
    "dog", "cat", "bird", "car", "wheel", "stripes", "dots", "sky", "grass",
    "water", "face", "text", "building", "food", "tree", "flower", "metal",
    "wood", "round shape", "red", "blue", "green",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fm", default="ViT-B-32")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--bpe", default=None)
    ap.add_argument("--tower", default="visual", choices=["visual", "text"])
    ap.add_argument("--blocks", type=int, nargs="*", default=None, help="default: last 2")
    ap.add_argument("--vocabulary", nargs="*", default=DEFAULT_VOCAB)
    ap.add_argument("--top", type=int, default=8, help="neurons reported per block")
    args = ap.parse_args()

    import jax.numpy as jnp

    from semanticlens_tpu.core import enable_compilation_cache

    enable_compilation_cache()
    from semanticlens_tpu.foundation_models import OpenClip, mlp_neuron_directions
    from semanticlens_tpu.lens import _embed_vocabulary, label_components

    fm = OpenClip(args.fm, checkpoint=args.checkpoint, bpe_path=args.bpe, dtype=jnp.bfloat16)
    cfg = fm.cfg
    if cfg.vision.kind != "vit" and args.tower == "visual":
        raise SystemExit("--tower visual needs a ViT preset (RN towers have no MLP blocks)")
    n_layers = cfg.vision.layers if args.tower == "visual" else cfg.text.layers
    blocks = args.blocks if args.blocks is not None else [n_layers - 2, n_layers - 1]

    templates = ["a photo of a {}"]
    vocab_embeds = _embed_vocabulary(fm, list(args.vocabulary), templates, 1024)

    report = {"fm": args.fm, "tower": args.tower, "blocks": {}}
    for block in blocks:
        dirs = mlp_neuron_directions(fm.params, cfg, block, tower=args.tower)
        words, scores = label_components(
            fm, list(args.vocabulary), dirs, top_m=1, vocab_embeds=np.asarray(vocab_embeds)
        )
        best = np.argsort(-scores[:, 0])[: args.top]
        report["blocks"][str(block)] = [
            {"neuron": int(i), "word": words[i][0], "score": round(float(scores[i, 0]), 4)}
            for i in best
        ]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
