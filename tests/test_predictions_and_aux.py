"""End-to-end predictions runner on a tiny model + aux tool tests."""
import json
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from capdec_tpu.aux import bridger as bridger_lib
from capdec_tpu.aux import modality_offset as mo_lib
from capdec_tpu.eval import predictions as pred_lib
from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.utils.tokenizer import ByteTokenizer

TINY = caption_model.CaptionModelConfig(
    prefix_length=4, clip_length=4, prefix_size=16, num_layers=2,
    mapping_type="mlp",
    gpt2=gpt2.GPT2Config(vocab_size=256, n_positions=96, n_embd=32,
                         n_layer=2, n_head=4))


@pytest.mark.slow
def test_run_predictions_beam_and_greedy(tmp_path):
    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    records = [{"image_id": i, "clip_embedding": i} for i in range(6)]
    prefixes = np.random.RandomState(0).randn(6, 16).astype(np.float32)
    embed_fn = pred_lib.make_pickle_embed_fn(prefixes)
    tok = ByteTokenizer()
    out = str(tmp_path / "preds.json")

    from capdec_tpu.decode import BeamConfig, ToppConfig
    cfg = pred_lib.PredictConfig(
        beam=True, batch_size=4,
        beam_config=BeamConfig(beam_size=3, entry_length=8,
                               stop_token=ord(".")),
        topp_config=ToppConfig(entry_length=8, stop_token=ord("."),
                               extra_stop_token=ord(".")))
    results = pred_lib.run_predictions(records, embed_fn, params, TINY, tok,
                                       cfg, out_path=out)
    assert len(results) == 6
    assert all(set(r) == {"caption", "image_id"} for r in results)
    assert json.load(open(out)) == results

    cfg.beam = False
    res2 = pred_lib.run_predictions(records, embed_fn, params, TINY, tok, cfg)
    assert len(res2) == 6


@pytest.mark.slow
def test_predictions_with_offset_changes_output():
    params = caption_model.init_params(jax.random.PRNGKey(1), TINY)
    records = [{"image_id": 0, "clip_embedding": 0}]
    prefixes = np.random.RandomState(1).randn(1, 16).astype(np.float32)
    tok = ByteTokenizer()
    from capdec_tpu.decode import BeamConfig
    base = pred_lib.PredictConfig(
        batch_size=1, beam_config=BeamConfig(beam_size=2, entry_length=6,
                                             stop_token=-1))
    r1 = pred_lib.run_predictions(records,
                                  pred_lib.make_pickle_embed_fn(prefixes),
                                  params, TINY, tok, base)
    off = pred_lib.PredictConfig(
        batch_size=1, add_modality_offset=True,
        modality_offset=np.full((1, 16), 1.5, np.float32),
        beam_config=base.beam_config)
    r2 = pred_lib.run_predictions(records,
                                  pred_lib.make_pickle_embed_fn(prefixes),
                                  params, TINY, tok, off)
    assert r1[0]["caption"] != r2[0]["caption"]


def test_modality_offset_calculator(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randn(100, 8).astype(np.float32) + 2.0
    txt = rng.randn(100, 8).astype(np.float32)
    centers = mo_lib.compute_centers(img, txt, num_pairs=50)
    np.testing.assert_allclose(
        centers["offset_to_add_in_training"],
        -centers["offset_to_add_in_inference"], atol=1e-7)
    assert centers["offset_to_add_in_training"].shape == (1, 8)
    out = str(tmp_path / "centers.pkl")
    mo_lib.save_centers(centers, out)
    with open(out, "rb") as f:
        loaded = pickle.load(f)
    assert set(loaded) == {"center_text", "center_image",
                           "offset_to_add_in_training",
                           "offset_to_add_in_inference"}


def test_bridger_identity_init_and_training(tmp_path):
    params = bridger_lib.init_bridger_params(dim=8, num_layers=3)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 8).astype(np.float32))
    out = bridger_lib.apply_bridger(jax.tree.map(jnp.asarray, params), x)
    # identity init + leaky_relu is NOT exactly identity for negatives,
    # but for positive inputs it is.
    xp = jnp.abs(x)
    outp = bridger_lib.apply_bridger(jax.tree.map(jnp.asarray, params), xp)
    np.testing.assert_allclose(np.asarray(outp), np.asarray(xp), atol=1e-6)

    # training moves image embeds toward text embeds
    rng = np.random.RandomState(1)
    img = rng.randn(256, 8).astype(np.float32)
    W = rng.randn(8, 8).astype(np.float32) * 0.2 + np.eye(8, dtype=np.float32)
    txt = img @ W
    trained = bridger_lib.train_bridger(img, txt, dim=8, num_layers=3,
                                        epochs=60, batch_size=64, lr=0.01,
                                        normalize=False, log_every=1000)
    pred = bridger_lib.apply_bridger(jax.tree.map(jnp.asarray, trained),
                                     jnp.asarray(img))
    mse_after = float(np.mean((np.asarray(pred) - txt) ** 2))
    mse_identity = float(np.mean((img - txt) ** 2))
    assert mse_after < mse_identity * 0.5

    # state_dict round trip
    path = str(tmp_path / "bridger.pt")
    bridger_lib.save_bridger(trained, path)
    from capdec_tpu.utils.checkpoint import load_state_dict
    back = bridger_lib.bridger_from_state_dict(load_state_dict(path))
    for a, b in zip(trained["layers"], back["layers"]):
        np.testing.assert_allclose(a["w"], b["w"], atol=1e-6)


def test_record_filter_drops_missing_images():
    """Records failing the filter (e.g. missing image files) are dropped
    entirely — not zero-embedded and scored (reference skip behavior,
    predictions_runner.py:206-209)."""
    params = caption_model.init_params(jax.random.PRNGKey(0), TINY)
    records = [{"image_id": i, "clip_embedding": i} for i in range(6)]
    prefixes = np.random.RandomState(0).randn(6, 16).astype(np.float32)
    embed_fn = pred_lib.make_pickle_embed_fn(prefixes)

    from capdec_tpu.decode import ToppConfig
    cfg = pred_lib.PredictConfig(
        beam=False, batch_size=4,
        topp_config=ToppConfig(entry_length=8, stop_token=ord("."),
                               extra_stop_token=ord(".")),
        record_filter=lambda d: d["image_id"] % 3 != 0)
    results = pred_lib.run_predictions(records, embed_fn, params, TINY,
                                       ByteTokenizer(), cfg)
    assert sorted(r["image_id"] for r in results) == [1, 2, 4, 5]
