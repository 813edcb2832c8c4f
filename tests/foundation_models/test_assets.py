"""Tokenizer asset discovery + multi-format CLIP BPE loading."""

import gzip
import json

import numpy as np
import pytest

from semanticlens_tpu.foundation_models.assets import (
    find_asset,
    find_clip_bpe,
    find_sentencepiece,
)
from semanticlens_tpu.foundation_models.tokenizer import ClipBpeTokenizer

MERGES = [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o</w>"), ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>")]


def _write_openclip_gz(path):
    lines = ["bpe_simple_vocab_16e6 (test subset)"] + [f"{a} {b}" for a, b in MERGES]
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines))


def _write_hf_merges(path):
    path.write_text("\n".join(["#version: 0.2"] + [f"{a} {b}" for a, b in MERGES]))


def _write_tokenizer_json(path, pairs_as_lists: bool):
    merges = [[a, b] for a, b in MERGES] if pairs_as_lists else [f"{a} {b}" for a, b in MERGES]
    path.write_text(json.dumps({"model": {"type": "BPE", "merges": merges}}))


def test_all_formats_tokenize_identically(tmp_path):
    gz = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    hf = tmp_path / "merges.txt"
    tj_str = tmp_path / "tokenizer_str.json"
    tj_list = tmp_path / "tokenizer_list.json"
    _write_openclip_gz(gz)
    _write_hf_merges(hf)
    _write_tokenizer_json(tj_str, pairs_as_lists=False)
    _write_tokenizer_json(tj_list, pairs_as_lists=True)

    outs = [np.asarray(ClipBpeTokenizer(p, 16)("hello world")) for p in (gz, hf, tj_str, tj_list)]
    for other in outs[1:]:
        np.testing.assert_array_equal(outs[0], other)
    # the merges actually apply: "hello" collapses into a single token
    tok = ClipBpeTokenizer(gz, 16)
    assert tok.bpe("hello") == "hello</w>"
    assert tok.bpe("world") == "world</w>"


def test_vocab_json_alone_is_rejected(tmp_path):
    vj = tmp_path / "vocab.json"
    vj.write_text(json.dumps({"a": 0}))
    with pytest.raises(ValueError, match="merges"):
        ClipBpeTokenizer(vj, 16)


def test_find_asset_env_search(tmp_path, monkeypatch):
    assets = tmp_path / "assets"
    assets.mkdir()
    _write_openclip_gz(assets / "bpe_simple_vocab_16e6.txt.gz")
    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(assets))
    hit = find_clip_bpe()
    assert hit is not None and hit.name == "bpe_simple_vocab_16e6.txt.gz"


def test_find_asset_near_checkpoint(tmp_path):
    ckpt_dir = tmp_path / "weights"
    ckpt_dir.mkdir()
    _write_hf_merges(ckpt_dir / "merges.txt")
    hit = find_clip_bpe(near=ckpt_dir / "model.safetensors")
    assert hit is not None and hit.name == "merges.txt"


def test_find_asset_recursive_under_env_root(tmp_path, monkeypatch):
    nested = tmp_path / "a" / "b"
    nested.mkdir(parents=True)
    _write_hf_merges(nested / "merges.txt")
    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(tmp_path))
    assert find_asset(("merges.txt",)) is not None


def test_find_sentencepiece_validates_content(tmp_path, monkeypatch):
    from semanticlens_tpu.foundation_models.sentencepiece import (
        UNKNOWN,
        SpModel,
        serialize_model,
    )

    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(tmp_path))
    # a torch-checkpoint-ish file named *.model must be rejected
    (tmp_path / "fake.model").write_bytes(b"PK\x03\x04 not sentencepiece")
    assert find_sentencepiece() is None
    (tmp_path / "real.model").write_bytes(
        serialize_model(SpModel(pieces=[("<unk>", 0.0, UNKNOWN), ("▁hi", -1.0, 1)]))
    )
    hit = find_sentencepiece()
    assert hit is not None and hit.name == "real.model"


def test_openclip_autodiscovers_bpe(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from semanticlens_tpu.foundation_models.clip import OpenClip

    _write_openclip_gz(tmp_path / "bpe_simple_vocab_16e6.txt.gz")
    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(tmp_path))
    fm = OpenClip("ViT-B-32", dtype=jnp.float32)
    assert isinstance(fm.tokenizer, ClipBpeTokenizer)


def test_siglip_autodiscovers_sentencepiece(tmp_path, monkeypatch):
    import jax.numpy as jnp

    from semanticlens_tpu.foundation_models.sentencepiece import (
        UNKNOWN,
        SigLipTokenizer,
        SpModel,
        serialize_model,
    )
    from semanticlens_tpu.foundation_models.siglip import SigLipV2

    (tmp_path / "spiece.model").write_bytes(
        serialize_model(SpModel(pieces=[("<unk>", 0.0, UNKNOWN), ("▁hi", -1.0, 1), ("</s>", 0.0, 3)], eos_id=2))
    )
    monkeypatch.setenv("SEMANTICLENS_ASSETS", str(tmp_path))
    fm = SigLipV2(dtype=jnp.float32)
    assert isinstance(fm.tokenizer, SigLipTokenizer)
    out = fm.tokenizer("hi", 4)
    assert out.shape == (1, 4)


# ---------------------------------------------------------------------------
# Asset-gated golden tests: run only where real tokenizer files exist (they
# cannot ship in this offline image, like pretrained weights). Expected ids
# are the published open_clip/CLIP tokenizations.
# ---------------------------------------------------------------------------
_REAL_BPE = find_clip_bpe()
_real_bpe_is_full = False
if _REAL_BPE is not None:
    try:
        _real_bpe_is_full = len(ClipBpeTokenizer(_REAL_BPE).encoder) == ClipBpeTokenizer.VOCAB_SIZE
    except Exception:
        _real_bpe_is_full = False


@pytest.mark.skipif(not _real_bpe_is_full, reason="no full CLIP BPE vocabulary on this machine")
def test_golden_openclip_token_ids():
    tok = ClipBpeTokenizer(_REAL_BPE)
    assert tok.sot_token == 49406 and tok.eot_token == 49407
    np.testing.assert_array_equal(tok("a dog")[0][:4], [49406, 320, 1929, 49407])
    np.testing.assert_array_equal(tok("a cat")[0][:4], [49406, 320, 2368, 49407])
    out = tok("a photo of a dog")[0]
    assert out[0] == 49406 and out[1] == 320
    assert 49407 in out


def test_fm_factory_routes_families():
    import jax.numpy as jnp

    from semanticlens_tpu import foundation_models as fms

    fm = fms.create("ViT-B-32", dtype=jnp.float32, seed=0)
    assert isinstance(fm, fms.OpenClip)
    fm = fms.create("siglip2", dtype=jnp.float32, seed=0)
    assert isinstance(fm, fms.SigLipV2)
    fm = fms.create("mobileclip-s1", dtype=jnp.float32, seed=0)
    assert isinstance(fm, fms.ClipMobile) and fm.cfg is not None
