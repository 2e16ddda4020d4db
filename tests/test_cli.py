"""CLI surface tests: flag names, presets, registries (no device work)."""
import json
import os
import pickle

import numpy as np


def test_train_parser_flag_surface():
    from capdec_tpu.cli.train import build_parser
    p = build_parser()
    args = p.parse_args([
        "--data", "x.pkl", "--noise_variance", "0.016", "--uniform_noise",
        "--dont_norm", "--lr", "1e-4", "--epochs", "3", "--save_every", "2",
        "--prefix_length", "20", "--prefix_length_clip", "10", "--bs", "16",
        "--only_prefix", "--mapping_type", "mlp", "--num_layers", "4",
        "--is_not_rn", "--use_image_embedding_as_clipcap",
        "--add_modality_offset", "--prefix", "run1", "--val_pt", "v.pkl",
        "--pretrain_weights", "w.pt", "--out_dir", "o"])
    assert args.noise_variance == 0.016 and args.uniform_noise
    assert args.prefix_length == 20 and args.bs == 16 and args.only_prefix


def test_train_presets(monkeypatch):
    from capdec_tpu.cli.train import apply_presets, build_parser
    monkeypatch.setenv("CAPDEC_DATA_ROOT", "/data")
    args = build_parser().parse_args(["--data", "COCO"])
    args = apply_presets(args)
    assert args.bs == 30
    assert args.data.startswith("/data/coco/")
    assert "val" in args.val_pt.lower() or args.val_pt

    args = build_parser().parse_args(["--data", "FLICKR"])
    args = apply_presets(args)
    assert args.bs == 16
    assert "flicker30" in args.data

    args = build_parser().parse_args(["--data", "COCO", "--dont_norm"])
    args = apply_presets(args)
    assert "not_norm" in args.data and args.val_pt == ""


def test_predict_registry_and_path_fns():
    from capdec_tpu.cli.predict import dataset_registry, image_path_fn_for_mode
    reg = dataset_registry("/data")
    assert set(reg) == set(range(9))
    fn = image_path_fn_for_mode(0, "/imgs")
    assert fn({"image_id": 42}) == "/imgs/COCO_val2014_000000000042.jpg"
    fn6 = image_path_fn_for_mode(6, "/imgs")
    assert "train2014" in fn6({"image_id": 1})
    fn1 = image_path_fn_for_mode(1, "/imgs")
    assert fn1({"filename": "a.jpg"}) == "/imgs/a.jpg"


def test_embeddings_mode_table():
    from capdec_tpu.cli.embeddings_generator import mode_table
    t = mode_table("/data", "RN50x4", True, 0)
    assert set(t) == {0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 7.0, 8.0, 9.0}
    # text-only corpora have no image root
    for m in (6.0, 7.0, 8.0, 9.0):
        assert t[m][2] == "NoImgs"
    assert "not_norm" in t[0.0][0]


def test_modality_offset_loader(tmp_path):
    from capdec_tpu.cli.train import load_modality_offset
    path = str(tmp_path / "centers.pkl")
    with open(path, "wb") as f:
        pickle.dump({"offset_to_add_in_training":
                     np.ones((1, 8), np.float32) * 0.5}, f)
    off = load_modality_offset(path)
    assert off.shape == (1, 8) and off.dtype == np.float32


def test_predict_parser_int8_kv_flag():
    from capdec_tpu.cli.predict import build_parser
    p = build_parser()
    assert p.parse_args([]).int8_kv is False
    assert p.parse_args(["--int8_kv"]).int8_kv is True


def test_parse_corpus_cli_all_modes(tmp_path, capsys):
    """cli.parse_corpus: the reference's three standalone parser scripts
    behind one command (parse_karpathy.py, hp_to_coco_format.py,
    parse_sheikspeare.py)."""
    from capdec_tpu.cli.parse_corpus import main

    karpathy = {"images": [
        {"filename": "COCO_val2014_000000000042.jpg", "split": "restval",
         "sentences": [{"raw": "a dog", "sentid": 1}]},
        {"filename": "COCO_val2014_000000000043.jpg", "split": "test",
         "sentences": [{"raw": "a cat", "sentid": 2}]},
    ]}
    kpath = tmp_path / "karpathy.json"
    kpath.write_text(json.dumps(karpathy))
    out_dir = tmp_path / "annos"
    main(["karpathy", "--karpathy_json", str(kpath),
          "--out_dir", str(out_dir)])
    rep = json.loads(capsys.readouterr().out)
    assert rep["captions"] == {"train": 1, "test": 1, "val": 0}
    train = json.loads((out_dir / "train.json").read_text())
    assert train == [{"image_id": 42, "caption": "a dog", "id": 1}]
    gt = json.loads((out_dir / "test_metrics_format.json").read_text())
    assert gt["images"] == [{"id": 43}]

    text = tmp_path / "corpus.txt"
    text.write_text("Page 1\nThe quick brown fox jumps over the dog.\n"
                    "Too short.\n")
    out = tmp_path / "open.json"
    main(["open_text", "--text", str(text), "--out", str(out)])
    recs = json.loads(out.read_text())
    assert len(recs) == 1 and "quick brown fox" in recs[0]["caption"]

    lines = tmp_path / "lines.txt"
    lines.write_text('"To be, or not to be"\n')
    out2 = tmp_path / "lines.json"
    main(["lines", "--text", str(lines), "--out", str(out2)])
    recs2 = json.loads(out2.read_text())
    assert recs2[0]["caption"] == "To be or not to be"


def test_score_cli_on_parity_fixtures(tmp_path, capsys):
    """cli.score reproduces eval.metrics.score_predictions on the shipped
    parity corpus (the reference's external pycocoevalcap step, in-repo)."""
    from capdec_tpu.cli.score import main
    from capdec_tpu.eval import metrics
    from capdec_tpu.eval.pycoco_adapter import load_fixtures

    preds, gt = load_fixtures()
    ppath, gpath = tmp_path / "p.json", tmp_path / "g.json"
    ppath.write_text(json.dumps(preds))
    gpath.write_text(json.dumps(gt))
    out = tmp_path / "scores.json"
    main(["--predictions", str(ppath), "--gt", str(gpath),
          "--out", str(out)])
    printed = json.loads(capsys.readouterr().out)
    saved = json.loads(out.read_text())
    want = metrics.score_predictions(preds, gt)
    for k, v in want.items():
        if isinstance(v, str):  # METEOR_variant tag
            assert printed[k] == v
        else:
            assert abs(printed[k] - v) < 1e-6
    assert saved == printed

    # optional matcher-stage files flow through to the variant tag
    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    main(["--predictions", str(ppath), "--gt", str(gpath),
          "--meteor_synonyms", os.path.join(fixtures, "meteor_synsets.txt"),
          "--meteor_paraphrases",
          os.path.join(fixtures, "meteor_paraphrases.txt")])
    tagged = json.loads(capsys.readouterr().out)
    assert tagged["METEOR_variant"] == "exact+stem+synonym+paraphrase"
    assert tagged["CIDEr"] == printed["CIDEr"]
