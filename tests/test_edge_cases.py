"""Edge-case coverage: caption truncation, cached forward key_mask, mesh
spec structure, empty-ish inputs."""
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.data import dataset as data_lib
from capdec_tpu.models import gpt2
from capdec_tpu.parallel import mesh as mesh_lib
from capdec_tpu.utils.tokenizer import ByteTokenizer


def test_long_caption_truncated_to_max_seq_len(tmp_path):
    caps = [{"caption": "hi", "image_id": 0, "id": 0, "clip_embedding": 0},
            {"caption": "x" * 500, "image_id": 1, "id": 1, "clip_embedding": 1}]
    data = {"clip_embedding": np.zeros((2, 4), np.float32), "captions": caps,
            "clip_embedding_text_dave": np.zeros((2, 4), np.float32)}
    p = str(tmp_path / "d.pkl")
    with open(p, "wb") as f:
        pickle.dump(data, f)
    ds = data_lib.load_caption_dataset(p, 2, ByteTokenizer(),
                                       max_seq_len_override=10)
    assert ds.tokens.shape == (2, 10)
    assert (ds.tokens[1] != 0).all()  # truncated, fully filled
    assert ds.mask[1, 2:].sum() == 10


def test_forward_with_cache_key_mask():
    cfg = gpt2.GPT2Config(vocab_size=40, n_positions=32, n_embd=16,
                          n_layer=1, n_head=2)
    params = gpt2.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 16).astype(np.float32) * 0.1)
    cache = gpt2.init_kv_cache(cfg, 1, 8)
    # mask out slot 1 entirely
    key_mask = jnp.asarray([[1, 0, 1, 1, 1, 1, 1, 1]], jnp.float32)
    logits_m, _ = gpt2.forward_with_cache(params, cfg, x, cache,
                                          jnp.asarray(0), key_mask=key_mask)
    logits, _ = gpt2.forward_with_cache(params, cfg, x, cache, jnp.asarray(0))
    # masking a visible key changes downstream logits
    assert not np.allclose(np.asarray(logits_m[:, 2:]),
                           np.asarray(logits[:, 2:]))
    # position 0 sees only itself either way
    np.testing.assert_allclose(np.asarray(logits_m[:, 0]),
                               np.asarray(logits[:, 0]), atol=1e-5)


def test_param_spec_structure_matches_params():
    from capdec_tpu.models import caption_model
    cfg = caption_model.CaptionModelConfig(
        prefix_length=2, clip_length=2, prefix_size=8, num_layers=1,
        mapping_type="transformer",
        gpt2=gpt2.GPT2Config(vocab_size=32, n_positions=16, n_embd=16,
                             n_layer=1, n_head=2))
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    specs = mesh_lib.caption_model_param_specs(params)
    # every param leaf has a spec leaf
    p_paths = {jax.tree_util.keystr(k)
               for k, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    from jax.sharding import PartitionSpec as P
    s_paths = {jax.tree_util.keystr(k) for k, _ in
               jax.tree_util.tree_flatten_with_path(
                   specs, is_leaf=lambda x: isinstance(x, P))[0]}
    assert p_paths == s_paths


def test_make_mesh_validates_device_count():
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(dp=3, tp=7)


def test_beam_single_image():
    from capdec_tpu.decode import BeamConfig, beam_search
    cfg = gpt2.GPT2Config(vocab_size=50, n_positions=32, n_embd=16,
                          n_layer=1, n_head=2)
    params = gpt2.init_params(jax.random.PRNGKey(1), cfg)
    pe = jnp.asarray(np.random.RandomState(0).randn(1, 3, 16).astype(np.float32))
    toks, lens, scores, order = beam_search(
        params, cfg, pe, BeamConfig(beam_size=2, entry_length=5, stop_token=-1))
    assert toks.shape == (1, 2, 5)
    assert np.asarray(lens).min() >= 1
