"""Prefix-interpretation tool tests (reference C15)."""
import numpy as np

import jax
import jax.numpy as jnp

from capdec_tpu.eval import prefix_tools
from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.utils.tokenizer import ByteTokenizer
import pytest

TINY = caption_model.CaptionModelConfig(
    prefix_length=4, clip_length=4, prefix_size=8, num_layers=1,
    mapping_type="mlp",
    gpt2=gpt2.GPT2Config(vocab_size=256, n_positions=64, n_embd=16,
                         n_layer=1, n_head=2))


def test_prefix_readout_nearest_token():
    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    tok = ByteTokenizer()
    # a prefix equal to wte rows must read out as exactly those tokens
    ids = [65, 66, 67]  # 'A', 'B', 'C'
    pe = gpt2.embed_tokens(params["gpt"], jnp.asarray(ids))[None]
    out = prefix_tools.get_prefix_tokens(params, pe, tok)
    assert out == "ABC"


def test_add_remove_positions():
    params = caption_model.init_params(jax.random.PRNGKey(1), TINY)
    tok = ByteTokenizer()
    pe = jnp.zeros((1, 4, 16))
    added = prefix_tools.add_embedding_from_text(params, "hi", pe, tok, 2)
    assert added.shape == (1, 6, 16)
    # insertion at -1 appends
    tail = prefix_tools.add_embedding_from_text(params, "hi", pe, tok, -1)
    np.testing.assert_array_equal(np.asarray(tail[:, :4]), np.asarray(pe))
    removed = prefix_tools.remove_positions(added, [0, 5])
    assert removed.shape == (1, 4, 16)


@pytest.mark.slow
def test_inspect_samples(tmp_path, capsys):
    import pickle
    from capdec_tpu.data import dataset as data_lib
    rng = np.random.RandomState(0)
    caps = [{"caption": f"cap {i}.", "image_id": 100 + i, "id": i,
             "clip_embedding": i} for i in range(6)]
    data = {"clip_embedding": rng.randn(6, 8).astype(np.float32),
            "captions": caps,
            "clip_embedding_text_dave": rng.randn(6, 8).astype(np.float32)}
    path = str(tmp_path / "d.pkl")
    with open(path, "wb") as f:
        pickle.dump(data, f)
    tok = ByteTokenizer()
    ds = data_lib.load_caption_dataset(path, TINY.prefix_length, tok)
    params = caption_model.init_params(jax.random.PRNGKey(2), TINY)
    out = prefix_tools.inspect_samples(params, TINY, ds, tok, [101, 104],
                                       use_beam=False)
    assert {r["image_id"] for r in out} == {101, 104}
    assert all("generated" in r and "prefix_tokens" in r for r in out)
