"""Golden-fixture generator + checker for real pretrained-weight parity.

The build image is zero-egress, so published checkpoints cannot ship with the
repo (exactly like the reference, which downloads through open_clip/HF at
first use — reference semanticlens/foundation_models/clip.py:52-62). This
tool closes the loop the offline full-size twin tests cannot: it pins the
framework's conversion + forward pass against embeddings computed from the
*published* weights.

Workflow (once, on a connected machine):

    python tools/fetch_assets.py clip-vit-b-32 --verify
        # fetch → convert → golden check, one command; or explicitly:
    python tools/make_golden.py generate clip-vit-b-32-laion2b \
        --checkpoint ~/.cache/semanticlens_tpu/clip-vit-b-32-laion2b.bin

``generate`` computes embeddings for DETERMINISTIC inputs (seeded uint8
images regenerated from the seed at check time — the fixture stores only the
few-KB embedding matrix) using the torch reference implementation when one
is importable (open_clip), falling back to this framework's own converted
tower (provenance recorded in the fixture; a self-provenance fixture is a
conversion-drift tripwire rather than independent ground truth). The fixture
lands in ``tests/fixtures/`` and is meant to be committed.

From then on, every machine that has the checkpoint (``SEMANTICLENS_ASSETS``)
re-verifies cosine ≥ 0.999 OFFLINE via
``tests/foundation_models/test_golden_weights.py`` — no torch reference
needed at check time (BASELINE.md:18, VERDICT r3 item 3).
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import hashlib
import json

import numpy as np

FIXTURE_DIR = _repo / "tests" / "fixtures"
IMAGE_SEED = 31415
N_IMAGES = 8
TEXTS = ("a photo of a dog", "a diagram", "stripes", "the night sky")
TARGET_COSINE = 0.999

# family key → (constructor kwargs resolved lazily, checkpoint filename
# patterns searched under SEMANTICLENS_ASSETS at check time)
FAMILIES: dict[str, dict] = {
    "clip-vit-b-32-laion2b": {
        "ckpt_patterns": ("clip-vit-b-32-laion2b.bin", "clip-vit-b-32-laion2b.safetensors"),
        "image_size": 224,
    },
    "clip-rn50-openai": {
        "ckpt_patterns": ("clip-rn50-openai.bin", "clip-rn50-openai.safetensors"),
        "image_size": 224,
    },
    "siglip2-b-16": {
        "ckpt_patterns": ("siglip2-b-16.bin", "siglip2-b-16.safetensors"),
        "image_size": 224,
    },
    "mobileclip-s1": {
        "ckpt_patterns": ("mobileclip_s1.pt", "mobileclip_s1.safetensors"),
        "image_size": 256,
    },
}


def deterministic_images(image_size: int, n: int = N_IMAGES) -> np.ndarray:
    """The fixture's inputs, regenerated bit-identically from the seed."""
    rng = np.random.default_rng(IMAGE_SEED)
    return rng.integers(0, 255, size=(n, image_size, image_size, 3), dtype=np.uint8)


def load_state_dict(path: str | Path) -> dict:
    """Checkpoint file → plain name→numpy mapping (torch pickle, safetensors,
    or npz). torch .bin/.pt loads happen here so the FM classes stay
    torch-free."""
    path = Path(path)
    if path.suffix in (".bin", ".pt", ".pth"):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file

        return load_file(path)
    if path.suffix == ".npz":
        return dict(np.load(path))
    raise ValueError(f"unsupported checkpoint format: {path}")


def build_fm(key: str, state_dict: dict):
    """Our converted tower for a family key, float32 for parity work."""
    import jax.numpy as jnp

    from semanticlens_tpu import foundation_models as fms

    if key == "clip-vit-b-32-laion2b":
        return fms.OpenClip("ViT-B-32-laion2B", checkpoint=state_dict, dtype=jnp.float32)
    if key == "clip-rn50-openai":
        return fms.OpenClip("RN50-openai", checkpoint=state_dict, dtype=jnp.float32)
    if key == "siglip2-b-16":
        return fms.SigLipV2(checkpoint=state_dict, dtype=jnp.float32)
    if key == "mobileclip-s1":
        return fms.ClipMobile("s1", checkpoint=state_dict, dtype=jnp.float32)
    raise KeyError(f"unknown golden family '{key}' (have {sorted(FAMILIES)})")


def _ckpt_fingerprint(path: str | Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()[:16]


def fixture_path(key: str) -> Path:
    return FIXTURE_DIR / f"golden_embeds_{key}.npz"


def embeds_from_fm(fm, image_size: int):
    """(image_embeds, text_embeds|None) float32 on the deterministic inputs.

    Text embeddings are fixture-worthy only with a REAL tokenizer — the
    HashTokenizer fallback produces machine-independent but meaningless ids.
    """
    images = deterministic_images(image_size)
    img = np.asarray(fm.encode_image(fm.preprocess(images)), np.float32)
    txt = None
    if type(fm.tokenizer).__name__ != "HashTokenizer":
        txt = np.asarray(fm.encode_text(fm.tokenize(list(TEXTS))), np.float32)
    return img, txt


def _torch_reference_embeds(key: str, checkpoint: Path, image_size: int):
    """Published-implementation embeddings, or None when not importable."""
    try:
        import open_clip
        import torch
        from PIL import Image
    except ImportError:
        return None, None
    model_name = {
        "clip-vit-b-32-laion2b": "ViT-B-32",
        "clip-rn50-openai": "RN50",
        "siglip2-b-16": "ViT-B-16-SigLIP2",
        "mobileclip-s1": "MobileCLIP-S1",
    }[key]
    model, _, preprocess = open_clip.create_model_and_transforms(
        model_name, pretrained=str(checkpoint)
    )
    model.eval()
    tokenizer = open_clip.get_tokenizer(model_name)
    images = deterministic_images(image_size)
    with torch.no_grad():
        batch = torch.stack([preprocess(Image.fromarray(im)) for im in images])
        img = model.encode_image(batch).float().numpy()
        txt = model.encode_text(tokenizer(list(TEXTS))).float().numpy()
    return img, txt


def cosine(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    bn = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True), 1e-12)
    return np.sum(an * bn, axis=-1)


def generate(
    key: str,
    checkpoint: str | Path | None = None,
    out: Path | None = None,
    *,
    fm=None,
    image_size: int | None = None,
) -> Path:
    """Write a golden fixture. ``fm`` injects a ready tower (tests); the
    normal path loads ``checkpoint`` and prefers the torch reference."""
    spec = FAMILIES.get(key, {"ckpt_patterns": (), "image_size": image_size})
    image_size = image_size or spec["image_size"]
    if fm is not None:
        img, txt = embeds_from_fm(fm, image_size)
        provenance = "injected-fm"
    else:
        checkpoint = Path(checkpoint)
        img, txt = _torch_reference_embeds(key, checkpoint, image_size)
        provenance = "torch-open_clip"
        if img is None:
            print("open_clip not importable — recording THIS framework's embeddings "
                  "(conversion-drift tripwire, not independent ground truth)")
            fm = build_fm(key, load_state_dict(checkpoint))
            img, txt = embeds_from_fm(fm, image_size)
            provenance = "semanticlens_tpu-conversion"
    meta = {
        "family": key,
        "image_seed": IMAGE_SEED,
        "n_images": N_IMAGES,
        "image_size": image_size,
        "texts": list(TEXTS),
        "ckpt_patterns": list(spec["ckpt_patterns"]),
        "ckpt_sha256_16": _ckpt_fingerprint(checkpoint) if checkpoint else "n/a",
        "provenance": provenance,
        "target_cosine": TARGET_COSINE,
    }
    out = out or fixture_path(key)
    out.parent.mkdir(parents=True, exist_ok=True)
    arrays = {"image_embeds": img.astype(np.float32), "meta": np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)}
    if txt is not None:
        arrays["text_embeds"] = txt.astype(np.float32)
    np.savez_compressed(out, **arrays)
    print(f"wrote {out} ({out.stat().st_size} bytes, provenance={provenance})")
    return out


def read_fixture(path: Path) -> tuple[dict, np.ndarray, np.ndarray | None]:
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        return meta, z["image_embeds"], (z["text_embeds"] if "text_embeds" in z else None)


def check(
    key: str,
    checkpoint: str | Path | None = None,
    fixture: Path | None = None,
    *,
    fm=None,
) -> dict:
    """Convert the checkpoint (or use an injected ``fm``), recompute on the
    deterministic inputs, compare against the fixture."""
    meta, ref_img, ref_txt = read_fixture(fixture or fixture_path(key))
    if fm is None:
        fm = build_fm(key, load_state_dict(checkpoint))
    img, txt = embeds_from_fm(fm, meta["image_size"])
    img_cos = cosine(img, ref_img)
    result = {
        "family": key,
        "provenance": meta["provenance"],
        "image_cosine_min": float(img_cos.min()),
        "image_cosine_mean": float(img_cos.mean()),
        "target": meta["target_cosine"],
    }
    if ref_txt is not None and txt is not None:
        txt_cos = cosine(txt, ref_txt)
        result["text_cosine_min"] = float(txt_cos.min())
    result["pass"] = result["image_cosine_min"] >= meta["target_cosine"] and (
        result.get("text_cosine_min", 1.0) >= meta["target_cosine"]
    )
    return result


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    for cmd in ("generate", "check"):
        p = sub.add_parser(cmd)
        p.add_argument("family", choices=sorted(FAMILIES))
        p.add_argument("--checkpoint", required=True)
        p.add_argument("--fixture", default=None)
    args = ap.parse_args()
    if args.cmd == "generate":
        generate(args.family, args.checkpoint,
                 Path(args.fixture) if args.fixture else None)
        return 0
    result = check(args.family, args.checkpoint,
                   Path(args.fixture) if args.fixture else None)
    print(json.dumps(result, indent=1))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
