"""SentencePiece parser/encoder tests against in-test golden models.

No ``.model`` asset ships in this environment, so the tests build models
with :func:`serialize_model` (the standard wire format) and verify the
parser + Unigram/BPE encoders against hand-computed segmentations.
"""

import numpy as np
import pytest

from semanticlens_tpu.foundation_models.sentencepiece import (
    BPE,
    BYTE,
    CONTROL,
    UNIGRAM,
    UNKNOWN,
    SentencePieceProcessor,
    SigLipTokenizer,
    SpModel,
    parse_model,
    serialize_model,
)

WS = "▁"


def _unigram_model(extra=(), **kwargs):
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        (WS + "hello", -1.0, 1),
        (WS + "world", -1.5, 1),
        (WS + "hell", -4.0, 1),
        ("o", -0.5, 1),
        (WS, -3.0, 1),
        ("h", -6.0, 1),
        ("e", -6.0, 1),
        ("l", -6.0, 1),
        ("w", -6.0, 1),
        ("o" + "r", -6.0, 1),
        ("r", -6.0, 1),
        ("d", -6.0, 1),
    ] + list(extra)
    return SpModel(pieces=pieces, model_type=UNIGRAM, unk_id=0, bos_id=1, eos_id=2, pad_id=-1, **kwargs)


def test_serialize_parse_roundtrip():
    model = _unigram_model(byte_fallback=True)
    parsed = parse_model(serialize_model(model))
    assert parsed.pieces == model.pieces
    assert parsed.model_type == UNIGRAM
    assert (parsed.unk_id, parsed.bos_id, parsed.eos_id, parsed.pad_id) == (0, 1, 2, -1)
    assert parsed.byte_fallback is True
    assert parsed.add_dummy_prefix and parsed.remove_extra_whitespaces and parsed.escape_whitespaces


def test_parse_rejects_garbage():
    with pytest.raises(ValueError):
        parse_model(b"not a protobuf at all")


def test_unigram_viterbi_picks_best_segmentation():
    sp = SentencePieceProcessor(_unigram_model())
    # "▁hello" scores -1.0 as one piece vs "▁hell"+"o" = -4.5 → whole word wins.
    assert sp.encode_as_pieces("hello") == [WS + "hello"]
    # two words, dummy prefix applies once, second space becomes ▁world
    assert sp.encode_as_pieces("hello world") == [WS + "hello", WS + "world"]


def test_unigram_prefers_higher_total_score_over_fewer_pieces():
    model = _unigram_model(extra=[(WS + "ab", -5.0, 1), (WS + "a", -1.0, 1), ("b", -1.0, 1)])
    sp = SentencePieceProcessor(model)
    # "▁a"+"b" = -2.0 beats "▁ab" = -5.0 despite more pieces.
    assert sp.encode_as_pieces("ab") == [WS + "a", "b"]


def test_unknown_char_gets_unk_id_and_merges_runs():
    sp = SentencePieceProcessor(_unigram_model())
    ids = sp.encode("hello ЖЖ")  # cyrillic not in vocab
    assert ids[0] == sp.piece_to_id(WS + "hello")
    # "▁" matched, then the two unknown chars collapse to ONE unk id
    assert ids[1] == sp.piece_to_id(WS)
    assert ids[2] == sp.model.unk_id
    assert len(ids) == 3


def test_byte_fallback_expands_unknown_to_bytes():
    byte_pieces = [(f"<0x{b:02X}>", -10.0, BYTE) for b in range(256)]
    sp = SentencePieceProcessor(_unigram_model(extra=byte_pieces, byte_fallback=True))
    ids = sp.encode("Ж")  # U+0416 → 0xD0 0x96
    tail = [sp.id_to_piece(i) for i in ids]
    assert tail[-2:] == ["<0xD0>", "<0x96>"]
    assert sp.decode(ids) == "Ж"


def test_normalization_nfkc_whitespace_dummy_prefix():
    sp = SentencePieceProcessor(_unigram_model())
    # NFKC: ﬁ → fi; extra whitespace collapses; dummy prefix adds one ▁
    assert sp.normalize("  hello   world ") == WS + "hello" + WS + "world"
    assert sp.normalize("ﬁ") == WS + "fi"


def test_no_dummy_prefix_or_escaping():
    model = _unigram_model()
    model.add_dummy_prefix = False
    model.escape_whitespaces = False
    sp = SentencePieceProcessor(model)
    assert sp.normalize("hello world") == "hello world"


def test_bpe_mode_merges_by_score_priority():
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, CONTROL),
        ("</s>", 0.0, CONTROL),
        (WS, -2.0, 1),
        ("a", -3.0, 1),
        ("b", -3.0, 1),
        ("c", -3.0, 1),
        ("ab", -0.5, 1),  # best merge
        ("bc", -1.0, 1),
        ("abc", -6.0, 1),  # exists but ab+c never merges to abc (no score path)
        (WS + "abc", -0.2, 1),
        (WS + "a", -4.0, 1),
    ]
    model = SpModel(pieces=pieces, model_type=BPE, unk_id=0, eos_id=2)
    sp = SentencePieceProcessor(model)
    # symbols ▁ a b c; candidate merges: ▁a(-4), ab(-0.5), bc(-1) → "ab" wins;
    # then ▁,ab,c: only abc(-6) merges → ▁,abc; then ▁abc(-0.2) → one piece.
    assert sp.encode_as_pieces("abc") == [WS + "abc"]
    ids = sp.encode("abc")
    assert all(i != model.unk_id for i in ids)


def test_decode_roundtrip_and_control_skipping():
    sp = SentencePieceProcessor(_unigram_model())
    ids = sp.encode("hello world")
    assert sp.decode(ids) == "hello world"
    assert sp.decode([1, 2] + ids) == "hello world"  # bos/eos dropped


def test_siglip_tokenizer_sticky_eos_and_padding():
    tok = SigLipTokenizer(serialize_model(_unigram_model()), context_length=8)
    out = tok(["hello world", "hello"])
    assert out.shape == (2, 8) and out.dtype == np.int32
    eos = tok.eot_token
    row = out[0].tolist()
    assert row[2] == eos, row
    assert all(t == eos for t in row[2:]), "padding must be the EOS id (pad_value=1 semantics)"
    # truncation keeps EOS as the final token
    long = tok("hello " * 50)[0].tolist()
    assert long[-1] == eos


def test_siglip_tokenizer_accepts_model_file(tmp_path):
    p = tmp_path / "toy.model"
    p.write_bytes(serialize_model(_unigram_model()))
    tok = SigLipTokenizer(p, context_length=6)
    np.testing.assert_array_equal(tok("hello"), tok(str("hello")))
    assert tok.vocab_size == len(_unigram_model().pieces)
