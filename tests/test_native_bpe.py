"""Native C++ BPE parity vs the pure-Python tokenizer (and HF)."""
import json

import pytest

from capdec_tpu.utils import tokenizer as tok
from capdec_tpu.utils.native_bpe import NativeGPT2Tokenizer


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("vocab_native")
    base = list(tok._bytes_to_unicode().values())
    vocab = {s: i for i, s in enumerate(sorted(base))}
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("i", "n"), ("Ġ", "a"),
        ("r", "e"), ("o", "n"), ("Ġthe", "Ġa"), ("e", "r"), ("Ġ", "."),
        ("a", "t"), ("Ġa", "t"), ("c", "at"), ("Ġ", "s"), ("Ġs", "at"),
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
    "",
    "newline\nand\ttab",
]


def _tokenizers(vocab_files):
    py = tok.GPT2Tokenizer.from_dir(str(vocab_files))
    native = NativeGPT2Tokenizer.from_files(
        str(vocab_files / "vocab.json"), str(vocab_files / "merges.txt"))
    if native._handle is None:
        pytest.skip("no C++ toolchain")
    return py, native


def test_native_matches_python(vocab_files):
    py, native = _tokenizers(vocab_files)
    for text in SAMPLES:
        assert native.encode(text) == py.encode(text), text


def test_native_batch(vocab_files):
    py, native = _tokenizers(vocab_files)
    got = native.encode_batch(list(SAMPLES))
    want = [py.encode(t) for t in SAMPLES]
    assert got == want


def test_native_is_faster_on_bulk(vocab_files):
    import time
    py, native = _tokenizers(vocab_files)
    texts = ["the cat sat on the mat and the rat ate there"] * 2000
    t0 = time.perf_counter()
    a = [py.encode(t) for t in texts]
    t_py = time.perf_counter() - t0
    py._bpe_cache.clear()
    t0 = time.perf_counter()
    b = native.encode_batch(texts)
    t_native = time.perf_counter() - t0
    assert a == b
    # informational; native must not be pathologically slower
    print(f"python {t_py:.3f}s native {t_native:.3f}s")
    assert t_native < t_py * 2
