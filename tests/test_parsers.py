"""Parser + gender-debias behavior tests (reference C2/C3/C5)."""
import json

import numpy as np

from capdec_tpu.data import parsers


def test_karpathy_split(tmp_path):
    kag = {
        "images": [
            {"filename": "COCO_val2014_000000391895.jpg", "split": "train",
             "sentences": [{"raw": "a man", "sentid": 1},
                           {"raw": "a person", "sentid": 2}]},
            {"filename": "COCO_val2014_000000000042.jpg", "split": "restval",
             "sentences": [{"raw": "restval cap", "sentid": 3}]},
            {"filename": "COCO_val2014_000000000007.jpg", "split": "test",
             "sentences": [{"raw": "test cap", "sentid": 4}]},
            {"filename": "COCO_val2014_000000000009.jpg", "split": "val",
             "sentences": [{"raw": "val cap", "sentid": 5}]},
        ]
    }
    src = tmp_path / "karpathy.json"
    src.write_text(json.dumps(kag))
    out = tmp_path / "out"
    splits = parsers.parse_karpathy_split(str(src), str(out))
    # restval folds into train
    assert len(splits["train"]) == 3
    assert splits["train"][0] == {"image_id": 391895, "caption": "a man", "id": 1}
    assert splits["train"][2]["image_id"] == 42
    assert len(splits["test"]) == 1 and len(splits["val"]) == 1
    metrics = json.loads((out / "train_metrics_format.json").read_text())
    assert metrics["images"][0]["id"] == 391895
    assert metrics["annotations"] == splits["train"]


def test_open_text_parser():
    text = ("Page 1\n"
            "The boy walked slowly to the castle gates. No.\n"
            "A wizard appeared with a very long beard and a pointed hat. "
            "Magic!\n")
    recs = parsers.parse_open_text(text)
    assert all(4 < len(r["caption"].split(" ")) < 20 for r in recs)
    assert all("Page" not in r["caption"] for r in recs)
    assert [r["image_id"] for r in recs] == list(range(len(recs)))


def test_line_corpus_parser():
    text = '"To be or not to be,"\n"That is the question,"\n'
    recs = parsers.parse_line_corpus(text)
    assert recs[0]["caption"] == "To be or not to be"
    assert recs[1]["caption"] == "That is the question"


def test_gender_term_detection():
    assert parsers.caption_has_gender_term("a man rides a wave")
    assert parsers.caption_has_gender_term("a man rides", 1)
    assert not parsers.caption_has_gender_term("a man rides", 2)
    assert parsers.caption_has_gender_term("a woman rides", 2)
    assert not parsers.caption_has_gender_term("a surfer rides a wave")


def test_change_gender_preserves_form():
    rng = np.random.default_rng(0)
    for _ in range(20):
        out = parsers.change_gender_randomly("the boy and his dad", rng)
        words = out.split(" ")
        assert words[1] in ("boy", "girl")
        # 'his' column pairs with 'her'
        assert words[3] in ("his", "her")
        assert words[4] in ("dad", "mom")
