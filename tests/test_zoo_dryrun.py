"""`zoo_parity.sh --dry-run`: the zoo-parity command chain must not rot.

The real artifacts (reference zoo checkpoint, OpenAI RN50x4.pt, Karpathy
JSON, COCO images) don't exist in the zero-egress container, so the script
fabricates tiny shape-valid stand-ins and runs the IDENTICAL chain:
Karpathy parse -> cli.predict with --clip_checkpoint + --infer_model_config
-> in-process scoring -> gate (gates disabled on random weights).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_zoo_parity_dry_run(tmp_path):
    env = dict(os.environ, OUT=str(tmp_path / "zoo_dryrun"),
               JAX_PLATFORMS="cpu")
    res = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "zoo_parity.sh"),
         "--dry-run"],
        capture_output=True, text=True, timeout=900, cwd=REPO, env=env)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "PARITY OK" in res.stdout
    preds_path = tmp_path / "zoo_dryrun" / "zoo_predictions.json"
    with open(preds_path) as f:
        preds = json.load(f)
    assert len(preds) == 4  # one caption per synthetic test image
    assert {"caption", "image_id"} <= set(preds[0])
    scores = json.load(open(tmp_path / "zoo_dryrun" /
                            "capdec_tiny_scores.json"))
    for k in ("CIDEr", "Bleu_4"):
        assert isinstance(scores[k], float)
