"""Embedding-extraction pipeline tests with a tiny random CLIP text encoder
and a stub tokenizer (no vocab files needed)."""
import json
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.data import embeddings as emb_lib
from capdec_tpu.models import clip as clip_lib


class StubClipTokenizer:
    """77-token fixed-context tokenizer: bytes, sot/eot wrapped."""

    def tokenize(self, texts, context_length=16):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [1] + [2 + (b % 40) for b in t.encode()][:context_length - 2] + [49]
            if len(ids) > context_length:
                raise RuntimeError(f"Input {t} is too long")
            out[i, :len(ids)] = ids
        return out


@pytest.fixture(scope="module")
def text_encoder():
    cfg = clip_lib.CLIPTextConfig(vocab_size=64, context_length=16, width=16,
                                  heads=2, layers=1, embed_dim=8)
    params = clip_lib.init_text_params(jax.random.PRNGKey(0), cfg)
    fn = jax.jit(lambda t: clip_lib.encode_text(params, cfg, jnp.asarray(t)))
    return fn


def test_encode_texts_batched_matches_single(text_encoder):
    records = [{"caption": f"a cat number {i}", "image_id": i, "id": i}
               for i in range(10)]
    tok = StubClipTokenizer()
    out = emb_lib.encode_texts_batched(records, tok, text_encoder,
                                       batch_size=4, progress=False)
    assert out.shape == (10, 8)
    single = np.asarray(text_encoder(tok.tokenize(records[3]["caption"])))
    np.testing.assert_allclose(out[3], single[0], atol=1e-5)


def test_gender_fix_applied(text_encoder):
    records = [{"caption": "a man rides a wave", "image_id": 0, "id": 0}]
    tok = StubClipTokenizer()
    emb_lib.encode_texts_batched(records, tok, text_encoder, batch_size=2,
                                 fix_gender_imbalance=1, progress=False,
                                 rng=np.random.default_rng(0))
    assert records[0]["caption"].split()[1] in ("man", "woman")


def test_generate_embeddings_end_to_end(tmp_path, text_encoder):
    # build annotations
    records = [{"caption": f"sentence {i}", "image_id": i, "id": i}
               for i in range(7)]
    ann = str(tmp_path / "ann.json")
    with open(ann, "w") as f:
        json.dump(records, f)
    out = str(tmp_path / "out.pkl")

    cfg = clip_lib.CLIPTextConfig(vocab_size=64, context_length=16, width=16,
                                  heads=2, layers=1, embed_dim=8)
    params = {"text": clip_lib.init_text_params(jax.random.PRNGKey(0), cfg)}
    full_cfg = clip_lib.CLIPConfig("tiny", cfg, clip_lib.CLIPViTConfig())
    emb_lib.generate_embeddings(ann, out, params, full_cfg,
                                StubClipTokenizer(), add_text_embedding=True,
                                batch_size=4, checkpoint_every=4)
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["clip_embedding_text_dave"].shape == (7, 8)
    assert [c["clip_embedding"] for c in data["captions"]] == list(range(7))
    # the pickle is readable by the training dataset layer
    from capdec_tpu.data import dataset as data_lib
    from capdec_tpu.utils.tokenizer import ByteTokenizer
    ds = data_lib.load_caption_dataset(out, 4, ByteTokenizer())
    assert len(ds) == 7 and ds.dim_clip == 8
