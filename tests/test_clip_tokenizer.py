"""CLIP BPE engine tests on a synthetic bpe_simple_vocab-format merge file.

Oracle: HuggingFace's CLIPTokenizer constructed from the equivalent
vocab.json + merges.txt (offline)."""
import gzip
import json

import numpy as np
import pytest

from capdec_tpu.utils import clip_tokenizer as ct
from capdec_tpu.utils.tokenizer import _bytes_to_unicode

transformers = pytest.importorskip("transformers")

MERGES = [
    ("t", "h"), ("th", "e</w>"), ("a", "</w>"), ("c", "a"), ("ca", "t</w>"),
    ("s", "a"), ("sa", "t</w>"), ("o", "n</w>"), ("m", "a"), ("ma", "n</w>"),
    ("r", "i"), ("ri", "d"), ("rid", "e"), ("ride", "s</w>"),
    ("w", "a"), ("wa", "v"), ("wav", "e</w>"),
]


@pytest.fixture(scope="module")
def bpe_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("clipbpe")
    # openai format: first line is a header, then merges; our loader slices
    # lines [1 : 49152-256-2+1], so short files just need the header.
    path = d / "bpe_simple_vocab_16e6.txt.gz"
    body = "version\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(body)
    return str(path)


@pytest.fixture(scope="module")
def tokenizers(bpe_file, tmp_path_factory):
    ours = ct.CLIPTokenizer(bpe_file)
    d = tmp_path_factory.mktemp("hfclip")
    vocab_path = d / "vocab.json"
    merges_path = d / "merges.txt"
    vocab_path.write_text(json.dumps(ours.encoder), encoding="utf-8")
    merges_path.write_text(
        "#version\n" + "\n".join(f"{a} {b}" for a, b in MERGES) + "\n",
        encoding="utf-8")
    theirs = transformers.CLIPTokenizer(str(vocab_path), str(merges_path))
    return ours, theirs


SAMPLES = [
    "The cat sat on the mat",
    "a man rides a wave",
    "HELLO  world!!",
    "it's the cat's toy",
]


def test_vocab_structure(bpe_file):
    tok = ct.CLIPTokenizer(bpe_file)
    base = len(_bytes_to_unicode())
    assert tok.vocab_size == 2 * base + len(MERGES) + 2
    assert tok.decoder[tok.sot] == "<|startoftext|>"
    assert tok.decoder[tok.eot] == "<|endoftext|>"


def test_parity_with_hf(tokenizers):
    ours, theirs = tokenizers
    for text in SAMPLES:
        got = ours.encode_text(text)
        want = theirs(text, add_special_tokens=False)["input_ids"]
        assert got == want, text


def test_tokenize_contract(tokenizers):
    ours, _ = tokenizers
    out = ours.tokenize(["a cat", "the man rides a wave"], context_length=12)
    assert out.shape == (2, 12) and out.dtype == np.int32
    assert out[0, 0] == ours.sot
    row = list(out[1])
    assert ours.eot in row
    with pytest.raises(RuntimeError):
        ours.tokenize("cat " * 40, context_length=12)
    toks, truncated = ct.tokenize_with_truncation(ours, "cat " * 100,
                                                  max_chars=10)
    assert truncated and toks.shape[1] == 77


def test_decode_round_trip(tokenizers):
    ours, _ = tokenizers
    for text in ["the cat sat on the mat", "a man rides a wave"]:
        ids = ours.encode_text(text)
        assert ours.decode(ids).strip() == text
