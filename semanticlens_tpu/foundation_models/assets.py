"""Tokenizer-asset discovery: find vocab/merges/SentencePiece files locally.

The reference gets tokenizer assets implicitly through open_clip/HF downloads
(reference semanticlens/foundation_models/clip.py:58-62). This build is
offline-first: tokenizer *code* is native (tokenizer.py, sentencepiece.py)
and the learned asset files — exactly like model checkpoints — are looked up
on the local machine:

1. ``$SEMANTICLENS_ASSETS`` (colon-separated directories), recursively;
2. alongside a given checkpoint path;
3. the standard HuggingFace hub cache layout
   (``~/.cache/huggingface/hub/models--*/snapshots/*/``);
4. an installed ``open_clip`` package's bundled
   ``bpe_simple_vocab_16e6.txt.gz``, if one exists.

Every matched format is supported: open_clip's gzip'd merges, HF
``merges.txt``/``vocab.json`` pairs, HF ``tokenizer.json``, and raw
SentencePiece ``.model`` files.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Iterable, Sequence

logger = logging.getLogger(__name__)

CLIP_BPE_PATTERNS = ("bpe_simple_vocab_16e6.txt.gz", "bpe_simple_vocab_16e6.txt", "merges.txt", "tokenizer.json")
SENTENCEPIECE_PATTERNS = ("*.spm", "spiece.model", "sentencepiece.model", "tokenizer.model", "*.model")


def _env_dirs() -> list[Path]:
    raw = os.environ.get("SEMANTICLENS_ASSETS", "")
    return [Path(p).expanduser() for p in raw.split(os.pathsep) if p]


def _hf_snapshot_dirs() -> Iterable[Path]:
    hub = Path(os.environ.get("HF_HOME", "~/.cache/huggingface")).expanduser() / "hub"
    if not hub.is_dir():
        return
    for model_dir in sorted(hub.glob("models--*")):
        yield from sorted(model_dir.glob("snapshots/*"))


def _open_clip_dir() -> Path | None:
    try:
        import open_clip  # noqa: PLC0415 — optional, not in this image

        return Path(open_clip.__file__).parent
    except ImportError:
        return None


def iter_assets(
    patterns: Sequence[str],
    *,
    near: str | Path | None = None,
    extra_dirs: Sequence[str | Path] = (),
) -> Iterable[Path]:
    """Yield files matching any pattern across the search roots, best-first.

    ``near`` adds a checkpoint's own directory (assets usually ship next to
    weights). Search order is deterministic: explicit dirs → $SEMANTICLENS_ASSETS
    → HF cache snapshots → installed open_clip.
    """
    roots: list[Path] = [Path(d).expanduser() for d in extra_dirs]
    if near is not None:
        p = Path(near).expanduser()
        roots.append(p if p.is_dir() else p.parent)
    roots += _env_dirs()
    roots += list(_hf_snapshot_dirs())
    oc = _open_clip_dir()
    if oc is not None:
        roots.append(oc)

    seen = set()
    for root in roots:
        if not root.is_dir():
            continue
        for pattern in patterns:
            hits = sorted(root.glob(pattern)) or sorted(root.rglob(pattern))
            for hit in hits:
                if hit.is_file() and hit not in seen:
                    seen.add(hit)
                    yield hit


def find_asset(
    patterns: Sequence[str],
    *,
    near: str | Path | None = None,
    extra_dirs: Sequence[str | Path] = (),
) -> Path | None:
    """First file matching any pattern across the search roots, or None."""
    for hit in iter_assets(patterns, near=near, extra_dirs=extra_dirs):
        logger.info("found tokenizer asset %s", hit)
        return hit
    return None


def find_clip_bpe(near: str | Path | None = None) -> Path | None:
    """Locate a CLIP BPE vocabulary in any supported format."""
    return find_asset(CLIP_BPE_PATTERNS, near=near)


def find_sentencepiece(near: str | Path | None = None) -> Path | None:
    """Locate a SentencePiece ``.model`` file (content-validated)."""
    from semanticlens_tpu.foundation_models.sentencepiece import parse_model

    for hit in iter_assets(SENTENCEPIECE_PATTERNS, near=near):
        try:  # guard against e.g. a torch checkpoint named *.model
            parse_model(hit.read_bytes())
        except (ValueError, IndexError):
            logger.warning("%s matched a SentencePiece pattern but is not a .model file", hit)
            continue
        logger.info("found SentencePiece model %s", hit)
        return hit
    return None
