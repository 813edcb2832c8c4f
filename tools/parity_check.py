"""Embedding-parity harness: JAX towers vs a torch reference checkpoint.

Usage (requires a checkpoint; the build environment is offline so this is a
deploy-side tool):

    python tools/parity_check.py --model ViT-B-32 \
        --checkpoint /path/open_clip_vitb32.safetensors \
        [--bpe /path/bpe_simple_vocab_16e6.txt.gz] [--images /path/imgs.npy]

Reports per-image cosine similarity between this framework's embeddings and
embeddings computed by torch open_clip (if importable) or stored reference
embeddings (``--reference-embeds ref.npy``). Target: cosine ≥ 0.999
(BASELINE.md). Writes a ``PARITY.json`` result artifact next to the repo root
(--out overrides) so deploy runs leave auditable evidence.
"""

from __future__ import annotations

import sys
from pathlib import Path

# Allow running as `python tools/<tool>.py` from a source checkout.
_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))


import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ViT-B-32")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--bpe", default=None)
    ap.add_argument("--images", default=None, help=".npy uint8 (N,H,W,3); random if omitted")
    ap.add_argument("--reference-embeds", default=None, help=".npy (N,D) torch-computed embeddings")
    ap.add_argument("--texts", nargs="*", default=["a photo of a dog", "a diagram", "stripes"])
    ap.add_argument("--out", default=str(_repo / "PARITY.json"))
    args = ap.parse_args()

    import jax.numpy as jnp

    from semanticlens_tpu.foundation_models import OpenClip

    fm = OpenClip(args.model, checkpoint=args.checkpoint, bpe_path=args.bpe, dtype=jnp.float32)

    if args.images:
        images = np.load(args.images)
    else:
        images = np.random.default_rng(0).integers(0, 255, size=(16, 224, 224, 3), dtype=np.uint8)

    ours_img = np.asarray(fm.encode_image(fm.preprocess(images)), np.float32)
    ours_txt = None
    if args.bpe:
        ours_txt = np.asarray(fm.encode_text(fm.tokenize(list(args.texts))), np.float32)

    if args.reference_embeds:
        ref = np.load(args.reference_embeds)
    else:
        ref = _torch_reference(args, images)
        if ref is None:
            print("No torch open_clip available and no --reference-embeds given; "
                  "saving our embeddings to parity_ours.npy for offline comparison.")
            np.save("parity_ours.npy", ours_img)
            return 0

    import json

    cos = _cosine(ours_img, ref)
    print(f"image-embedding cosine: min={cos.min():.6f} mean={cos.mean():.6f}")
    ok = bool(cos.min() >= 0.999)
    print("PASS" if ok else "FAIL", "(target ≥ 0.999)")
    if ours_txt is not None:
        print("text embeddings computed:", ours_txt.shape)
    result = {
        "model": args.model,
        "checkpoint": str(args.checkpoint),
        "n_images": int(ours_img.shape[0]),
        "cosine_min": float(cos.min()),
        "cosine_mean": float(cos.mean()),
        "target": 0.999,
        "pass": ok,
        "reference": "open_clip-torch" if args.reference_embeds is None else str(args.reference_embeds),
        "tokenizer": type(fm.tokenizer).__name__,
    }
    Path(args.out).write_text(json.dumps(result, indent=1))
    print(f"wrote {args.out}")
    return 0 if ok else 1


def _torch_reference(args, images):
    try:
        import open_clip
        import torch
    except ImportError:
        return None
    model, _, preprocess = open_clip.create_model_and_transforms(
        args.model, pretrained=args.checkpoint
    )
    model.eval()
    from PIL import Image

    with torch.no_grad():
        batch = torch.stack([preprocess(Image.fromarray(im)) for im in images])
        return model.encode_image(batch).float().numpy()


def _cosine(a, b):
    an = a / np.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=-1, keepdims=True)
    return np.sum(an * bn, axis=-1)


if __name__ == "__main__":
    sys.exit(main())
