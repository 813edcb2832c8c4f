"""Tokenizer tests: BPE algorithm golden values and framing semantics.

A miniature merges file exercises the full BPE pipeline (byte→unicode,
``</w>`` endings, merge ranks); framing (SOT/EOT, truncation, padding) is
asserted to match open_clip's tokenize contract.
"""

import re

import numpy as np
import pytest

from semanticlens_tpu.foundation_models.tokenizer import (
    ClipBpeTokenizer,
    HashTokenizer,
    bytes_to_unicode,
)


def test_bytes_to_unicode_reversible():
    table = bytes_to_unicode()
    assert len(table) == 256
    assert len(set(table.values())) == 256


@pytest.fixture
def mini_bpe(tmp_path):
    # Version line + a few merges. Vocab = 256 bytes + 256 "</w>" + merges + 2 specials.
    merges = ["#version: 0.2", "h e", "he l", "hel l", "hell o</w>", "l o</w>"]
    fp = tmp_path / "bpe.txt"
    fp.write_text("\n".join(merges) + "\n")
    return ClipBpeTokenizer(fp, context_length=8)


def test_bpe_merges_applied(mini_bpe):
    # "hello" fully merges via the chain h+e, he+l, hel+l, hell+o</w>.
    toks = mini_bpe.encode("hello")
    assert toks == [mini_bpe.encoder["hello</w>"]]


def test_bpe_unmerged_word_falls_back_to_chars(mini_bpe):
    toks = mini_bpe.encode("xyz")
    expected = [
        mini_bpe.encoder["x"],
        mini_bpe.encoder["y"],
        mini_bpe.encoder["z</w>"],
    ]
    assert toks == expected


def test_framing_and_padding(mini_bpe):
    arr = mini_bpe(["hello"])
    assert arr.shape == (1, 8)
    assert arr[0, 0] == mini_bpe.sot_token
    assert arr[0, 2] == mini_bpe.eot_token
    assert (arr[0, 3:] == 0).all()


def test_truncation_keeps_eot(mini_bpe):
    arr = mini_bpe(["xyz xyz xyz xyz xyz"])
    assert arr.shape == (1, 8)
    assert arr[0, -1] == mini_bpe.eot_token


def test_lowercase_and_whitespace_cleanup(mini_bpe):
    a = mini_bpe(["  HELLO   "])
    b = mini_bpe(["hello"])
    np.testing.assert_array_equal(a, b)


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(vocab_size=100, context_length=6)
    a = tok(["a photo of a dog"])
    b = tok(["a photo of a dog"])
    np.testing.assert_array_equal(a, b)
    assert a[0, 0] == 98  # SOT = vocab−2
    assert tok(["x"]).shape == (1, 6)


def test_unicode_words_tokenize_as_letters(mini_bpe):
    # 'café' must be matched as ONE word by the \p{L}+-equivalent class
    # (open_clip semantics), not split at the accent.
    toks = re.findall(mini_bpe.pat, "café 99 !?")
    assert toks == ["café", "9", "9", "!?"]


def test_unicode_other_numbers_split_like_p_N(mini_bpe):
    # ² is \p{N} (No) but not \d: open_clip emits it as a single number token.
    from semanticlens_tpu.foundation_models.tokenizer import _split_numeric_runs
    toks = _split_numeric_runs(re.findall(mini_bpe.pat, "x²y ½"))
    assert toks == ["x", "²", "y", "½"]


# --- golden open_clip ids (run only when a real merges asset is discovered) --

_GOLDEN = {
    # Recorded from open_clip SimpleTokenizer / official CLIP tokenizer.
    "hello world!": [49406, 3306, 1002, 256, 49407],
    "a photo of a dog": [49406, 320, 1125, 539, 320, 1929, 49407],
    "": [49406, 49407],
}


@pytest.fixture(scope="module")
def real_bpe():
    from semanticlens_tpu.foundation_models.assets import find_clip_bpe

    path = find_clip_bpe()
    if path is None:
        pytest.skip("no CLIP BPE asset on this machine (offline image)")
    return ClipBpeTokenizer(path, context_length=77)


def test_real_vocab_size(real_bpe):
    assert len(real_bpe.encoder) == ClipBpeTokenizer.VOCAB_SIZE
    assert real_bpe.sot_token == 49406 and real_bpe.eot_token == 49407


@pytest.mark.parametrize("text", sorted(_GOLDEN))
def test_golden_open_clip_ids(real_bpe, text):
    arr = real_bpe([text])
    ids = [int(t) for t in arr[0] if t != 0] if text else [49406, 49407]
    assert ids == _GOLDEN[text]
