"""Fetch tokenizer assets + pretrained checkpoints (needs network egress).

The build environment is zero-egress, so learned assets — tokenizer
vocabularies and model weights — cannot ship with the repo (exactly like the
reference, which downloads them through open_clip/HF at first use,
reference semanticlens/foundation_models/clip.py:52-62). Run this tool once
on a connected machine; everything lands in ``--dest`` (default
``~/.cache/semanticlens_tpu``) where
:mod:`semanticlens_tpu.foundation_models.assets` discovers it via
``SEMANTICLENS_ASSETS`` (set it to the dest dir) or pass paths explicitly.

    python tools/fetch_assets.py tokenizers            # BPE vocab + SigLIP spm
    python tools/fetch_assets.py clip-vit-b-32         # openai CLIP weights
    python tools/fetch_assets.py siglip2-b-16          # SigLIP2 weights + spm
    python tools/fetch_assets.py --list

Downloads use plain HTTPS from the canonical public hosts; every artifact is
verified by re-parsing it with the framework's own loaders before being kept.
"""

from __future__ import annotations

import sys
from pathlib import Path

_repo = Path(__file__).resolve().parent.parent
if str(_repo) not in sys.path:
    sys.path.insert(0, str(_repo))

import argparse
import urllib.error
import urllib.request

HF = "https://huggingface.co"

# name -> list of (url, filename)
ASSETS: dict[str, list[tuple[str, str]]] = {
    "tokenizers": [
        (
            # CLIP BPE merges (HF mirror of open_clip's bpe_simple_vocab_16e6)
            f"{HF}/openai/clip-vit-base-patch32/resolve/main/merges.txt",
            "merges.txt",
        ),
        (
            f"{HF}/openai/clip-vit-base-patch32/resolve/main/vocab.json",
            "vocab.json",
        ),
        (
            # SigLIP sentencepiece (c4_en 32k, the model SigLIP ships)
            f"{HF}/timm/ViT-B-16-SigLIP/resolve/main/sentencepiece.model",
            "sentencepiece.model",
        ),
    ],
    "clip-vit-b-32": [
        (
            f"{HF}/laion/CLIP-ViT-B-32-laion2B-s34B-b79K/resolve/main/open_clip_pytorch_model.bin",
            "clip-vit-b-32-laion2b.bin",
        ),
    ],
    "clip-rn50": [
        (f"{HF}/timm/resnet50_clip.openai/resolve/main/open_clip_pytorch_model.bin", "clip-rn50-openai.bin"),
    ],
    "siglip2-b-16": [
        (f"{HF}/timm/ViT-B-16-SigLIP2/resolve/main/open_clip_pytorch_model.bin", "siglip2-b-16.bin"),
        (f"{HF}/timm/ViT-B-16-SigLIP2/resolve/main/sentencepiece.model", "siglip2-sentencepiece.model"),
    ],
    "mobileclip-s1": [
        (
            "https://docs-assets.developer.apple.com/ml-research/datasets/mobileclip/mobileclip_s1.pt",
            "mobileclip_s1.pt",
        ),
    ],
    "gpt2": [
        # LM-dissection subject weights (models/gpt.py loads either bin):
        # torch pickle of GPT2LMHeadModel — load_torch_state_dict takes it raw
        (f"{HF}/openai-community/gpt2/resolve/main/pytorch_model.bin", "gpt2.bin"),
    ],
    "llama-3.2-1b": [
        # Llama-family subject weights (models/llama.py, Llama.from_name
        # ("llama-3.2-1b")); gated repo — export HF_TOKEN before fetching
        (f"{HF}/meta-llama/Llama-3.2-1B/resolve/main/model.safetensors",
         "llama-3.2-1b.safetensors"),
    ],
    "tinyllama-1.1b": [
        # ungated Llama-architecture checkpoint for models/llama.py
        (f"{HF}/TinyLlama/TinyLlama_v1.1/resolve/main/model.safetensors",
         "tinyllama-1.1b.safetensors"),
    ],
}


def _verify(path: Path) -> None:
    """Sanity-parse downloaded artifacts with the framework's own loaders."""
    if path.suffix == ".model":
        from semanticlens_tpu.foundation_models.sentencepiece import parse_model

        model = parse_model(path.read_bytes())
        print(f"  verified SentencePiece model: {model.vocab_size} pieces")
    elif path.name == "merges.txt":
        from semanticlens_tpu.foundation_models.tokenizer import ClipBpeTokenizer

        tok = ClipBpeTokenizer(path)
        assert len(tok.encoder) == tok.VOCAB_SIZE, len(tok.encoder)
        print(f"  verified CLIP BPE: vocab {len(tok.encoder)}")


def _open_with_scoped_auth(url: str, token: str | None, *, max_redirects: int = 8):
    """urlopen that sends Authorization ONLY to the original HF host.

    HF ``resolve/`` URLs 302-redirect LFS files to presigned CDN hosts
    (cdn-lfs/Xet, X-Amz-* query auth). Python's default redirect handler
    copies ALL headers to the redirect target, which (a) leaks the bearer
    token to a third-party host and (b) trips S3-style "only one auth
    mechanism" 400s. Follow redirects manually and drop the header the
    moment the host changes — the same policy huggingface_hub/requests use.
    """
    from urllib.parse import urlsplit, urljoin

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            return None

    opener = urllib.request.build_opener(_NoRedirect)
    origin = urlsplit(url).netloc
    for _ in range(max_redirects):
        req = urllib.request.Request(url)  # noqa: S310 — canonical hosts above
        if token and urlsplit(url).netloc == origin and url.startswith(HF):
            # gated repos (meta-llama/…) need an accepted-license token
            req.add_header("Authorization", f"Bearer {token}")
        try:
            return opener.open(req)
        except urllib.error.HTTPError as err:
            if err.code in (301, 302, 303, 307, 308) and err.headers.get("Location"):
                url = urljoin(url, err.headers["Location"])
                continue
            raise
    raise urllib.error.URLError(f"too many redirects fetching {url}")


def fetch(name: str, dest: Path) -> None:
    import os
    import shutil

    dest.mkdir(parents=True, exist_ok=True)
    token = os.environ.get("HF_TOKEN")
    for url, fname in ASSETS[name]:
        target = dest / fname
        if target.exists():
            print(f"{fname}: already present")
        else:
            print(f"{fname}: downloading {url}")
            tmp = target.with_suffix(target.suffix + ".part")
            with _open_with_scoped_auth(url, token) as resp, open(tmp, "wb") as out:
                shutil.copyfileobj(resp, out)
            tmp.rename(target)
        _verify(target)


def golden_verify(dest: Path) -> bool:
    """Fetch → convert → golden check, one command (``--verify``).

    For every golden family (tools/make_golden.py) whose checkpoint is now
    present under ``dest``: if a committed fixture exists, re-convert the
    checkpoint with THIS framework and assert cosine ≥ 0.999 against the
    fixture; otherwise generate the fixture (preferring the torch reference
    implementation as ground truth when importable) so it can be committed.
    Returns True when every applicable family passed.
    """
    import json
    import os

    import make_golden

    os.environ.setdefault("SEMANTICLENS_ASSETS", str(dest))
    ok = True
    for family, spec in make_golden.FAMILIES.items():
        ckpt = next(
            (dest / p for p in spec["ckpt_patterns"] if (dest / p).exists()), None
        )
        if ckpt is None:
            continue
        fixture = make_golden.fixture_path(family)
        if not fixture.exists():
            print(f"{family}: no fixture yet — generating from {ckpt.name}")
            make_golden.generate(family, ckpt)
            print(f"  commit {fixture} to pin real-weight parity offline")
            continue
        result = make_golden.check(family, ckpt, fixture)
        print(json.dumps(result))
        ok &= result["pass"]
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help=f"asset sets: {sorted(ASSETS)}")
    ap.add_argument("--dest", default="~/.cache/semanticlens_tpu")
    ap.add_argument("--list", action="store_true")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="after fetching, run the golden real-weight parity check "
        "(tools/make_golden.py) for every family whose checkpoint is present",
    )
    args = ap.parse_args()
    if args.names == ["all"]:
        # the one-command connected-host runbook:
        #   python tools/fetch_assets.py all --verify
        # fetches every asset set, then generates/checks the golden
        # real-weight fixtures for every family (commit tests/fixtures/)
        args.names = sorted(ASSETS)
    if args.list or (not args.names and not args.verify):
        for name, items in ASSETS.items():
            print(f"{name}:")
            for url, fname in items:
                print(f"  {fname} <- {url}")
        return
    dest = Path(args.dest).expanduser()
    for name in args.names:
        if name not in ASSETS:
            raise SystemExit(f"unknown asset set '{name}' (have {sorted(ASSETS)})")
        fetch(name, dest)
    print(f"\ndone. export SEMANTICLENS_ASSETS={dest}")
    if args.verify and not golden_verify(dest):
        raise SystemExit("golden real-weight parity check FAILED")


if __name__ == "__main__":
    main()
