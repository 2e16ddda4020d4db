"""pycocoevalcap parity adapter: fixture snapshot (always) + real-chain
agreement (when the package is installed — not in this container)."""
import numpy as np
import pytest

from capdec_tpu.eval import pycoco_adapter
from capdec_tpu.eval.metrics import score_predictions

# Snapshot of the in-repo chain's scores on the shipped fixture corpus
# (tests/fixtures/parity_*.json). Guards the PTB tokenizer + scorers
# against silent drift; the pycoco test below re-validates the same
# numbers against the real chain wherever it is importable.
FIXTURE_SNAPSHOT = {
    "Bleu_1": 0.601307,
    "Bleu_2": 0.53822,
    "Bleu_3": 0.489527,
    "Bleu_4": 0.449375,
    "METEOR": 0.538737,
    "ROUGE_L": 0.551342,
    "CIDEr": 1.141849,
    "num_images": 32.0,
}


def test_fixture_scores_match_snapshot():
    predictions, gt = pycoco_adapter.load_fixtures()
    assert len(predictions) == 32
    scores = score_predictions(predictions, gt)
    for k, v in FIXTURE_SNAPSHOT.items():
        np.testing.assert_allclose(scores[k], v, atol=1e-6,
                                   err_msg=f"metric {k} drifted")


@pytest.mark.skipif(not pycoco_adapter.pycocoevalcap_available(),
                    reason="pycocoevalcap not installed (zero-egress "
                           "container); runs in weights-bearing envs")
def test_agreement_with_real_pycocoevalcap():
    report = pycoco_adapter.compare_on_fixtures()
    for k in pycoco_adapter.COMPARED_KEYS:
        assert report["delta"][k] <= 1e-4, (
            f"{k}: ours={report['ours'][k]:.6f} "
            f"pycoco={report['pycoco'][k]:.6f}")
