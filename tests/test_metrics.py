"""Metric sanity + BLEU parity vs nltk's corpus_bleu."""
import numpy as np
import pytest

from capdec_tpu.eval import metrics

CANDS = {
    1: ["a man is riding a wave on a surfboard"],
    2: ["a cat sits on the red mat"],
    3: ["two dogs play with a ball in the park"],
}
REFS = {
    1: ["a man riding a wave on top of a surfboard",
        "a surfer rides a big wave",
        "the man surfs a wave"],
    2: ["a cat sitting on a mat", "the cat is on the mat",
        "a kitten rests on a red mat"],
    3: ["dogs playing with a ball at the park",
        "two dogs run after a ball", "a pair of dogs with a toy outside"],
}


def test_bleu_matches_nltk():
    nltk = pytest.importorskip("nltk")
    from nltk.translate.bleu_score import corpus_bleu

    refs_tok = [[metrics.ptb_tokenize(r) for r in REFS[k]] for k in CANDS]
    cands_tok = [metrics.ptb_tokenize(CANDS[k][0]) for k in CANDS]
    ours = metrics.bleu(CANDS, REFS)
    for n in range(1, 5):
        weights = tuple([1.0 / n] * n)
        ref = corpus_bleu(refs_tok, cands_tok, weights=weights)
        assert abs(ours[n - 1] - ref) < 1e-6, (n, ours[n - 1], ref)


def test_perfect_match_scores():
    cands = {k: [REFS[k][0]] for k in REFS}
    b = metrics.bleu(cands, REFS)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    assert abs(metrics.rouge_l(cands, REFS) - 1.0) < 1e-9
    c = metrics.cider_d(cands, REFS)
    assert c > metrics.cider_d(CANDS, REFS)


def test_disjoint_captions_score_zero():
    cands = {k: ["zebra xylophone quantum"] for k in REFS}
    b = metrics.bleu(cands, REFS)
    assert b[3] < 1e-6
    assert metrics.rouge_l(cands, REFS) == 0.0
    assert metrics.cider_d(cands, REFS) < 1e-6


def test_cider_orders_quality():
    good = {1: [REFS[1][0]], 2: [REFS[2][0]], 3: [REFS[3][0]]}
    mid = CANDS
    bad = {k: ["completely unrelated text here"] for k in REFS}
    cg = metrics.cider_d(good, REFS)
    cm = metrics.cider_d(mid, REFS)
    cb = metrics.cider_d(bad, REFS)
    assert cg > cm > cb


def test_score_predictions_end_to_end():
    preds = [{"caption": CANDS[k][0], "image_id": k} for k in CANDS]
    gt = {"images": [{"id": k} for k in REFS],
          "annotations": [{"image_id": k, "caption": r, "id": i}
                          for i, (k, rs) in enumerate(REFS.items())
                          for r in rs]}
    out = metrics.score_predictions(preds, gt)
    assert set(out) >= {"Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"}
    assert 0 < out["Bleu_1"] <= 1
    assert out["num_images"] == 3
