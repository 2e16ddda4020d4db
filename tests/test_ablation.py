"""Ablation distance metrics + predictions-runner wiring."""
import numpy as np

import jax

from capdec_tpu.eval import ablation
from capdec_tpu.eval import predictions as pred_lib
from capdec_tpu.models import caption_model, gpt2
from capdec_tpu.utils.tokenizer import ByteTokenizer
import pytest


def test_count_ready_and_distances(tmp_path):
    rng = np.random.RandomState(0)
    d = {}
    for img in range(4):
        base_m = rng.randn(12)
        base_c = rng.randn(6)
        d[img] = [(base_m + 0.01 * rng.randn(12),
                   base_c + 0.01 * rng.randn(6)) for _ in range(5)]
    d[99] = [(rng.randn(12), rng.randn(6))]  # incomplete group
    assert ablation.count_ready(d) == 4
    out = str(tmp_path / "dist.pkl")
    stats = ablation.calc_distances(d, out_file=out)
    assert stats["l2_clip"] > 0
    # tight paraphrases => small distances
    assert stats["l2_clip"] < 0.1
    import pickle
    with open(out, "rb") as f:
        raw = pickle.load(f)
    assert set(raw) == {"distances_clip", "distances_l2_clip",
                        "max_distances_l1"}


def test_gap_tracker():
    g = ablation.ImageTextGapTracker()
    g.update(np.asarray([1.0, 0.0]), np.asarray([0.0, 1.0]))
    assert abs(g.mean_gap - np.sqrt(2)) < 1e-6


@pytest.mark.slow
def test_run_predictions_with_ablation():
    cfg = caption_model.CaptionModelConfig(
        prefix_length=3, clip_length=3, prefix_size=8, num_layers=1,
        mapping_type="mlp",
        gpt2=gpt2.GPT2Config(vocab_size=64, n_positions=48, n_embd=16,
                             n_layer=1, n_head=2))
    params = caption_model.init_params(jax.random.PRNGKey(0), cfg)
    # 2 images x 5 paraphrase records each (same image_id)
    records = [{"image_id": i // 5, "clip_embedding": i, "caption": "x"}
               for i in range(10)]
    prefixes = np.random.RandomState(1).randn(10, 8).astype(np.float32)
    from capdec_tpu.decode import BeamConfig
    pcfg = pred_lib.PredictConfig(
        beam=True, batch_size=5, ablation_dist=True,
        ablation_dist_ready_at=10**9,  # summarize at the end, don't exit
        ablation_image_dist=True,
        text_embed_fn=lambda chunk: prefixes[[r["clip_embedding"]
                                              for r in chunk]] + 0.1,
        beam_config=BeamConfig(beam_size=2, entry_length=4, stop_token=-1))
    res = pred_lib.run_predictions(
        records, pred_lib.make_pickle_embed_fn(prefixes), params, cfg,
        ByteTokenizer(), pcfg)
    assert len(res) == 10
