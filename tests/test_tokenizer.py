"""BPE engine parity vs HuggingFace's GPT2Tokenizer on a synthetic vocab.

We cannot download the real gpt2 vocab (zero egress), but HF's slow
GPT2Tokenizer can be constructed from local files — so we synthesize a
byte-level vocab + merge table, write it to disk, and require id-level
parity between our engine and HF's on varied text.
"""
import json

import pytest

from capdec_tpu.utils import tokenizer as tok

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab")
    base = list(tok._bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(sorted(base))}
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("Ġ", "a"),
        ("r", "e"), ("o", "n"), ("Ġthe", "Ġa"), ("e", "r"), ("Ġ", "."),
        ("a", "t"), ("Ġa", "t"), ("c", "at"),
    ]
    for a, b in merges:
        if a + b not in vocab:
            vocab[a + b] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab), encoding="utf-8")
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n",
        encoding="utf-8")
    return d


SAMPLES = [
    "the cat sat on the mat.",
    "A man riding a wave on top of a surfboard .",
    "hello,   world!!  123",
    "naïve café — déjà vu?",
    "it's the cats' toy. don't",
    "  leading and trailing  ",
    "newline\nand\ttab",
]


def test_parity_with_hf(vocab_files):
    ours = tok.GPT2Tokenizer.from_dir(str(vocab_files))
    theirs = transformers.GPT2Tokenizer(
        str(vocab_files / "vocab.json"), str(vocab_files / "merges.txt"))
    for text in SAMPLES:
        assert ours.encode(text) == theirs.encode(text), text


def test_decode_round_trip(vocab_files):
    ours = tok.GPT2Tokenizer.from_dir(str(vocab_files))
    for text in SAMPLES:
        assert ours.decode(ours.encode(text)) == text


def test_byte_tokenizer_round_trip():
    t = tok.ByteTokenizer()
    for text in SAMPLES:
        assert t.decode(t.encode(text)) == text
    assert t.stop_token_ids[0] == ord(".")
