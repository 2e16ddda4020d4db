"""Dataset/pickle round-trip and padding-semantics tests (SURVEY.md §4)."""
import os
import pickle

import numpy as np
import pytest

from capdec_tpu.data import dataset as data_lib
from capdec_tpu.utils.tokenizer import ByteTokenizer


def make_pickle(path, n=10, dim=8, seed=0):
    rng = np.random.RandomState(seed)
    captions = [{"caption": f"a cat number {i} sat.", "image_id": i,
                 "id": i, "clip_embedding": i} for i in range(n)]
    data = {
        "clip_embedding": rng.randn(n, dim).astype(np.float32),
        "captions": captions,
        "clip_embedding_text_dave": rng.randn(n, dim).astype(np.float32),
    }
    with open(path, "wb") as f:
        pickle.dump(data, f)
    return data


def test_load_text_vs_image_embeddings(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    raw = make_pickle(p)
    tok = ByteTokenizer()
    ds_text = data_lib.load_caption_dataset(p, prefix_length=4, tokenizer=tok)
    np.testing.assert_array_equal(ds_text.prefixes,
                                  raw["clip_embedding_text_dave"])
    os.remove(str(tmp_path / "embeds_tokens.pkl"))
    ds_img = data_lib.load_caption_dataset(p, prefix_length=4, tokenizer=tok,
                                           use_image_embedding=True)
    np.testing.assert_array_equal(ds_img.prefixes, raw["clip_embedding"])


def test_padding_and_mask_semantics(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    make_pickle(p)
    K = 3
    ds = data_lib.load_caption_dataset(p, prefix_length=K,
                                       tokenizer=ByteTokenizer())
    # mask = K prefix ones followed by the token validity mask
    assert ds.mask.shape[1] == K + ds.tokens.shape[1]
    np.testing.assert_array_equal(ds.mask[:, :K], 1.0)
    np.testing.assert_array_equal(ds.mask[:, K:] > 0, ds.tokens != 0)


def test_token_cache_round_trip(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    make_pickle(p)
    tok = ByteTokenizer()
    ds1 = data_lib.load_caption_dataset(p, prefix_length=2, tokenizer=tok)
    assert os.path.isfile(str(tmp_path / "embeds_tokens.pkl"))
    ds2 = data_lib.load_caption_dataset(p, prefix_length=2, tokenizer=tok)
    np.testing.assert_array_equal(ds1.tokens, ds2.tokens)


def test_max_seq_len_heuristic():
    lengths = np.asarray([5, 7, 9, 11, 400])
    got = data_lib.compute_max_seq_len(lengths)
    mean, std = lengths.mean(), lengths.std(ddof=1)
    assert got == min(int(mean + 10 * std), 400)
    assert data_lib.compute_max_seq_len(lengths, override=40) == 40


def test_normalize_prefix(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    make_pickle(p)
    ds = data_lib.load_caption_dataset(p, prefix_length=2,
                                       tokenizer=ByteTokenizer(),
                                       normalize_prefix=True)
    np.testing.assert_allclose(np.linalg.norm(ds.prefixes, axis=1), 1.0,
                               atol=1e-5)


def test_add_period():
    assert data_lib.add_period("a cat") == "a cat."
    assert data_lib.add_period("a cat .") == "a cat."
    assert data_lib.add_period("a cat. ") == "a cat."
    assert data_lib.add_period("a cat.") == "a cat."


def test_batching_shapes_and_drop_last(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    make_pickle(p, n=10)
    ds = data_lib.load_caption_dataset(p, prefix_length=2,
                                       tokenizer=ByteTokenizer())
    batches = list(data_lib.iterate_batches(ds, 4, seed=1))
    assert len(batches) == 2  # 10 // 4 with drop_last
    for b in batches:
        assert b["tokens"].shape[0] == 4
        assert b["mask"].shape == (4, 2 + ds.tokens.shape[1])
        assert b["prefix"].shape == (4, 8)
    # deterministic per (seed, epoch); different across epochs
    again = list(data_lib.iterate_batches(ds, 4, seed=1))
    np.testing.assert_array_equal(batches[0]["tokens"], again[0]["tokens"])
    other = list(data_lib.iterate_batches(ds, 4, seed=1, epoch=1))
    assert not np.array_equal(batches[0]["tokens"], other[0]["tokens"])


def test_subsample_pickle(tmp_path):
    p = str(tmp_path / "embeds.pkl")
    out = str(tmp_path / "few.pkl")
    make_pickle(p, n=20)
    data_lib.subsample_pickle(p, 5, out)
    with open(out, "rb") as f:
        sub = pickle.load(f)
    assert len(sub["captions"]) == 5
    assert sub["clip_embedding"].shape[0] == 5
    for i, c in enumerate(sub["captions"]):
        assert c["clip_embedding"] == i
