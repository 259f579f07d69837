"""Tokenizer: byte mapping, merges, round trips, reference quirks."""

import json

import pytest

from smolvision_tpu.text.tokenizer import Tokenizer, bytes_to_unicode, load_tokenizer


def test_bytes_to_unicode_bijection():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
    assert m[ord("!")] == "!"
    assert m[ord("~")] == "~"
    assert m[32] == "Ġ"  # space -> Ġ


def test_roundtrip_bytes(tiny_model_dir):
    tok = load_tokenizer(tiny_model_dir)
    for text in ["hello world", "the theme", " English", "naïve café 音声", "a\nb\tc"]:
        ids = tok.encode(text)
        assert tok.decode(ids) == text


def test_merges_apply_lowest_rank_first(tmp_path):
    # vocab: a b c ab abc ; merges: (a b) rank0, (ab c) rank1
    vocab = {"a": 0, "b": 1, "c": 2, "ab": 3, "abc": 4}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("a b\nab c\n")
    tok = Tokenizer(str(tmp_path / "vocab.json"))
    assert tok.encode("abc") == [4]
    assert tok.encode("abcabc") == [4, 4]
    assert tok.encode("cab") == [2, 3]


def test_no_regex_pretokenization(tiny_model_dir):
    # The whole input is one BPE word: "the" after a space must merge through
    # the space-containing symbols only if such merges exist; with our tiny
    # merges "Ġthe" exists via (Ġ,the)?  Here we only assert the encoder is
    # deterministic and reversible, and that multi-word text produces the
    # space byte token path.
    tok = load_tokenizer(tiny_model_dir)
    ids = tok.encode("the the")
    assert tok.decode(ids) == "the the"


def test_special_ids_decode_empty(tiny_model_dir):
    tok = load_tokenizer(tiny_model_dir)
    assert tok.decode_piece(151643) == b""
    assert tok.decode_piece(151704) == b""
    assert tok.decode([151644, 151645]) == ""


def test_piece_bytes_concatenate_to_utf8(tiny_model_dir):
    tok = load_tokenizer(tiny_model_dir)
    text = "héllo"
    ids = tok.encode(text)
    raw = b"".join(tok.decode_piece(i) for i in ids)
    assert raw.decode("utf-8") == text
